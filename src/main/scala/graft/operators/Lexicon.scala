package graft.operators

import graft.Q
import graft.functions.{Sketches, TextFns}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Lexicon operators — the vocabulary artifacts a tokenizer/retrieval
  * pipeline derives from a corpus before training or serving:
  *
  *   - `vocab_oov`: build the top-V frequency vocabulary, then score
  *     every document's out-of-vocabulary rate against it — the
  *     coverage check run before committing to a tokenizer vocab (a
  *     corpus slice with high OOV under the proposed vocab means the
  *     vocab was fit on the wrong distribution).
  *   - `inverted_index`: term → (df, total tf, capped posting sample) —
  *     the retrieval index artifact behind X45's BM25 scoring.
  *
  * 100 TB posture: the vocabulary is CONSTANT-SIZE by construction
  * (top-V of a term-count aggregation, taken with a bounded
  * `TakeOrderedAndProject`), so the OOV probe is a broadcast hash join
  * against the token scan — the token stream itself never shuffles for
  * membership, only the two hash aggregations (term counts; per-doc
  * counts) move data, both map-side-partial. The inverted index caps
  * postings with the mergeable bounded-heap aggregator (X29's
  * [[Sketches.TopKAgg]]) rather than `collect_list` — a stopword term
  * appearing in every document costs O(k) state in every partial
  * buffer, never an |docs|-sized array on one reducer.
  */
object Lexicon {

  /** Tiny on purpose: the synthetic corpus draws from a ~31-word
    * vocabulary, so V=10 leaves a real OOV tail to measure. */
  private val VocabSize = 10

  private val MinDf = 5
  private val PostingCap = 20

  /** Shared DuckDB fragment (parity with [[TextFns.tokens]]). */
  private val duckToks =
    """list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9\s]+', '', 'g')), '\s+'), t -> len(t) > 0)"""

  def all: Seq[Q] = Seq(

    // Vocabulary coverage / OOV rate. Vocab ties break (count DESC,
    // term ASC) so the cut is engine-deterministic; docs with zero
    // tokens stay on the spine with a NULL rate (0/0) in both engines.
    Q("vocab_oov",
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($duckToks) AS term FROM documents),
         |cnt AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
         |vocab AS (
         |  SELECT term AS v_term FROM cnt ORDER BY c DESC, term LIMIT $VocabSize),
         |pd AS (
         |  SELECT t.doc_id,
         |    CAST(count(*) AS BIGINT) AS n_tokens,
         |    CAST(count(CASE WHEN v.v_term IS NULL THEN 1 END) AS BIGINT) AS n_oov
         |  FROM toks t LEFT JOIN vocab v ON t.term = v.v_term
         |  GROUP BY t.doc_id)
         |SELECT d.doc_id,
         |  coalesce(n_tokens, 0) AS n_tokens,
         |  coalesce(n_oov, 0) AS n_oov,
         |  round(CAST(coalesce(n_oov, 0) AS DOUBLE)
         |    / nullif(CAST(coalesce(n_tokens, 0) AS DOUBLE), 0.0), 9) AS oov_rate
         |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
      val vocab = toks.groupBy("term").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("term")).limit(VocabSize)
        .select(col("term").as("v_term"))
      val perDoc = toks
        .join(broadcast(vocab), col("term") === col("v_term"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          count(when(col("v_term").isNull, lit(1))).as("n_oov"))
      docs.select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("n_oov"), lit(0L)).as("n_oov"),
          round(try_divide(coalesce(col("n_oov"), lit(0L)).cast("double"),
            nullif(coalesce(col("n_tokens"), lit(0L)).cast("double"), lit(0.0))), 9)
            .as("oov_rate"))
        .orderBy("doc_id")
    },

    // X62b: per-language vocabulary NUCLEUS — the smallest
    // frequency-ranked token set covering ≥90% of that language's token
    // mass (the tokenizer-design statistic: how head-heavy is each
    // language's distribution). Ranking ties break (count DESC, term
    // ASC) like vocab_oov; the 90% threshold compares 10·cumsum ≥
    // 9·total in EXACT integer arithmetic, so the cut index can never
    // tip on a float boundary between engines. Shuffles: one (lang,
    // term) hash agg, a |langs|-sized window spine, one final count —
    // all linear in distinct terms, never in tokens.
    Q("vocab_nucleus",
      s"""WITH toks AS (
         |  SELECT d.lang, unnest($duckToks) AS term FROM documents d),
         |cnt AS (SELECT lang, term, count(*) AS c FROM toks GROUP BY lang, term),
         |tot AS (SELECT lang, sum(c) AS total, count(*) AS n_terms FROM cnt GROUP BY lang),
         |run AS (
         |  SELECT lang, term, c,
         |    sum(c) OVER (PARTITION BY lang ORDER BY c DESC, term
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM cnt),
         |nuc AS (
         |  SELECT r.lang, count(*) AS nucleus_size
         |  FROM run r JOIN tot t USING (lang)
         |  WHERE (r.cum - r.c) * 10 < t.total * 9
         |  GROUP BY r.lang)
         |SELECT t.lang, t.n_terms, nuc.nucleus_size,
         |  round(CAST(nuc.nucleus_size AS DOUBLE) / CAST(t.n_terms AS DOUBLE), 9) AS nucleus_frac
         |FROM tot t JOIN nuc USING (lang) ORDER BY t.lang""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val cnt = Tables.documents(s, d)
        .select(col("lang"), explode(TextFns.tokens(col("text"))).as("term"))
        .groupBy("lang", "term").agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy("lang")
        .agg(sum(col("c")).as("total"), count(lit(1)).as("n_terms"))
      val w = Window.partitionBy("lang").orderBy(col("c").desc, col("term"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // a term is IN the nucleus iff the mass BEFORE it is still short
      // of 90% — the first rank at-or-past the threshold is included,
      // everything after excluded (same rule both engines, exact ints)
      val nuc = cnt
        .withColumn("cum", sum(col("c")).over(w))
        .join(broadcast(tot), "lang")
        .filter((col("cum") - col("c")) * 10 < col("total") * 9)
        .groupBy("lang").agg(count(lit(1)).as("nucleus_size"))
      tot.join(nuc, "lang")
        .select(col("lang"), col("n_terms"), col("nucleus_size"),
          round(col("nucleus_size").cast("double") / col("n_terms").cast("double"), 9)
            .as("nucleus_frac"))
        .orderBy("lang")
    },

    // Inverted index: per term, document frequency, total term
    // frequency, and the first PostingCap doc ids (ascending) as a
    // comma-joined sample. The posting cap is a bounded heap keyed on
    // -doc_id (score DESC == id ASC), so the agg is mergeable and the
    // per-term state is O(cap) regardless of df.
    Q("inverted_index",
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($duckToks) AS term FROM documents),
         |tf AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY term, doc_id)
         |SELECT term,
         |  CAST(count(*) AS BIGINT) AS df,
         |  CAST(SUM(tf) AS BIGINT) AS tf_total,
         |  array_to_string(
         |    list_transform(list_sort(list(doc_id))[1:$PostingCap],
         |                   x -> CAST(x AS VARCHAR)), ',') AS postings
         |FROM tf GROUP BY term HAVING count(*) >= $MinDf
         |ORDER BY term""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
      val tf = toks.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      tf.groupBy("term")
        .agg(count(lit(1)).as("df"),
          sum("tf").as("tf_total"),
          Sketches.topK(PostingCap)(-col("doc_id").cast("double"), col("doc_id")).as("post"))
        .filter(col("df") >= MinDf)
        .select(col("term"), col("df"), col("tf_total"),
          concat_ws(",", transform(col("post"), x => x.getField("_2").cast("string")))
            .as("postings"))
        .orderBy("term")
    },

    // X63b: phrase matching over POSITIONAL postings — the index-side
    // mechanism behind exact phrase search ("table hash" as adjacent
    // tokens), as a retrieval system runs it: per-term position lists
    // intersected with a +1 offset, never a substring rescan of the
    // corpus. Only the two phrase terms' postings are materialized
    // (scan-local filter BEFORE the join — the shuffle carries term
    // hits, not the token stream), joined on doc_id with the adjacency
    // offset in the join condition. Positions are 0-based Spark-side
    // and 1-based in DuckDB; the join compares DELTAS, so the base
    // cancels in both engines.
    Q("phrase_match_positional",
      s"""WITH pd AS (SELECT doc_id, $duckToks AS t FROM documents),
         |toks AS (
         |  SELECT doc_id, t[u.i] AS term, u.i AS pos
         |  FROM pd, unnest(range(1, len(t) + 1)) AS u(i)),
         |a AS (SELECT doc_id, pos FROM toks WHERE term = 'table'),
         |b AS (SELECT doc_id, pos FROM toks WHERE term = 'hash')
         |SELECT a.doc_id, count(*) AS n_occurrences
         |FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(TextFns.tokens(col("text"))).as(Seq("pos", "term")))
      val a = toks.filter(col("term") === "table")
        .select(col("doc_id"), col("pos").as("pos_a"))
      val b = toks.filter(col("term") === "hash")
        .select(col("doc_id").as("doc_b"), col("pos").as("pos_b"))
      a.join(b, col("doc_id") === col("doc_b") && col("pos_b") === col("pos_a") + 1)
        .groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
        .orderBy("doc_id")
    }
  )
}
