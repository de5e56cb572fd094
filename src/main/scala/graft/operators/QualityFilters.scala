package graft.operators

import graft.Q
import graft.functions.TextFns
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hard quality GATES for training-data curation (X22/X23) — the
  * Gopher-rules / C4-style filter pass that runs before dedup:
  * per-document token-shape signals with a reject/keep decision, and
  * corpus-level boilerplate detection (n-grams shared across documents).
  *
  * Distinct from X11 `doc_quality` (a composite score): these are the
  * published-pipeline-style binary gates (Rae et al. Gopher §A.1.1,
  * Raffel et al. C4) re-expressed over this corpus's signals.
  *
  * Scale posture: everything is explode → keyed hash aggregation; the
  * boilerplate pass shuffles on the n-gram string (high cardinality) and
  * then on doc_id — no broadcast of corpus state, no driver loop. The
  * keep decision compares RAW ratios (identical IEEE division in both
  * engines); display columns are rounded once at the end
  * (graft parity rule — see doc_quality).
  */
object QualityFilters {

  private val stop = Seq("the", "a", "of", "and", "to", "in")

  /** X22: per-doc Gopher-style signals + keep gate. Thresholds chosen to
    * BIND on this corpus (each rejects a real slice; see spec). */
  def gopherFilters(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val per = tf.groupBy("doc_id").agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("n_unique"),
      max(col("c")).as("top_cnt"),
      sum(col("c") * length(col("w"))).as("char_sum"),
      sum(when(col("w").isin(stop: _*), col("c")).otherwise(0L)).as("stopword_hits"))
    val nTok = col("n_tokens").cast("double")
    val meanLen = col("char_sum").cast("double") / nTok
    val fracUniq = col("n_unique").cast("double") / nTok
    val topFrac = col("top_cnt").cast("double") / nTok
    per.select(
      col("doc_id"),
      col("n_tokens"),
      round(meanLen, 9).as("mean_word_len"),
      round(fracUniq, 9).as("frac_unique"),
      round(topFrac, 9).as("top_token_frac"),
      col("stopword_hits"),
      (col("n_tokens") >= 30 && meanLen <= 5.0 && fracUniq >= 0.4 &&
        topFrac <= 0.15 && col("stopword_hits") >= 2).as("keep"))
      .orderBy("doc_id")
  }

  /** X23: corpus-frequent 5-gram ("boilerplate") fraction per doc —
    * a gram is boilerplate when ≥2 distinct docs contain it. */
  def boilerplate(docs: DataFrame): DataFrame = {
    // the explicit repartition is the SHARED exchange both consumers sit
    // on: the df-count branch and the join-back probe branch need grams
    // hash-distributed by g, but left to itself the planner gives the
    // df branch a partial-agg exchange and the probe branch a raw-rows
    // exchange — canonically different subtrees, so AQE can't reuse and
    // the corpus is gram-exploded TWICE (r14 ScanAudit). Pinning one
    // user-specified exchange makes both branches read the same
    // materialized shuffle: one explode, one gram shuffle. The df count
    // loses its map-side partial, but grams are array_distinct per doc —
    // partials barely compressed, and the probe branch was shipping the
    // raw rows anyway.
    // up-front isNotNull (the doc_bigram_surprise trick): the final LEFT
    // JOIN infers isnotnull(doc_id) on the probe branch only, which would
    // de-canonicalize the two copies of this subtree under the shared
    // repartition exchange
    val grams = docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        explode(array_distinct(TextFns.ngrams(col("text"), 5))).as("g"))
      .repartition(col("g"))
    // count(doc_id) ≡ count(1) here (doc_id non-null) but REFERENCES
    // doc_id, so column pruning can't strip it from this branch's copy
    // of the gram generator — keeping both subtrees canonically equal
    // is what lets AQE serve them from one materialized shuffle
    val dfreq = grams.groupBy("g").agg(count(col("doc_id")).as("nd"))
    val per = grams.join(dfreq, "g").groupBy("doc_id").agg(
      count(lit(1)).as("n_grams"),
      sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_boiler"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        round(try_divide(col("n_boiler").cast("double"),
          col("n_grams").cast("double")), 9).as("boiler_frac"))
      .orderBy("doc_id")
  }

  /** X32: per-doc token Shannon entropy — the repetitiveness signal
    * quality pipelines threshold on (low entropy = word-soup spam /
    * template text; high = diverse vocabulary). H = −Σ (c/n)·log₂(c/n)
    * over the doc's token counts. Parity: the sum is a SEQUENTIAL fold
    * over counts in sorted-token order (`array_sort` + `aggregate` HOF
    * here ≡ DuckDB `list(... ORDER BY w)` + `list_sum`), so both engines
    * accumulate in the same order; ÷ and unary − are IEEE-exact, log₂
    * agrees to the ulp at 6 dp (same pattern tfidf proved out).
    *
    * Scale posture: explode → (doc, token) hash agg → per-doc agg; the
    * collect_list is per-document vocabulary (bounded by doc length),
    * never corpus-wide. */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val n = col("n_tokens").cast("double")
    tf.groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_unique"),
        array_sort(collect_list(struct(col("w"), col("c")))).as("wc"))
      .select(col("doc_id"), col("n_tokens"), col("n_unique"),
        round(aggregate(col("wc"), lit(0.0d), (acc, x) => {
          val p = x.getField("c").cast("double") / n
          acc - p * log2(p)
        }), 6).as("entropy"))
      .orderBy("doc_id")
  }

  private val duckToks =
    """list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9\s]+', '', 'g')), '\s+'), t -> len(t) > 0)"""

  def all: Seq[Q] = Seq(

    Q("quality_gopher_filters",
      s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
         |ex AS (SELECT doc_id, unnest(t) AS w FROM toks),
         |tf AS (SELECT doc_id, w, count(*) AS c FROM ex GROUP BY doc_id, w),
         |per AS (SELECT doc_id,
         |  CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_unique,
         |  CAST(max(c) AS BIGINT) AS top_cnt,
         |  CAST(sum(c * len(w)) AS BIGINT) AS char_sum,
         |  CAST(sum(CASE WHEN w IN ('the','a','of','and','to','in') THEN c ELSE 0 END) AS BIGINT) AS stopword_hits
         |  FROM tf GROUP BY doc_id)
         |SELECT doc_id, n_tokens,
         |  round(CAST(char_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE), 9) AS mean_word_len,
         |  round(CAST(n_unique AS DOUBLE) / CAST(n_tokens AS DOUBLE), 9) AS frac_unique,
         |  round(CAST(top_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE), 9) AS top_token_frac,
         |  stopword_hits,
         |  (n_tokens >= 30
         |    AND CAST(char_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 5.0
         |    AND CAST(n_unique AS DOUBLE) / CAST(n_tokens AS DOUBLE) >= 0.4
         |    AND CAST(top_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 0.15
         |    AND stopword_hits >= 2) AS keep
         |FROM per ORDER BY doc_id""".stripMargin) { (s, d) =>
      gopherFilters(Tables.documents(s, d))
    },

    // the toks WHERE mirrors the Spark side's up-front isNotNull(doc_id)
    // (r14 ADVICE: without it, a gram shared between a null-id doc and
    // one real doc would flip nd from 2 to 1 on one engine only — the
    // null-free invariant must be enforced identically, not assumed)
    Q("boilerplate_ngrams",
      s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents
         |  WHERE doc_id IS NOT NULL),
         |grams AS (SELECT DISTINCT doc_id, array_to_string(t[u.i:u.i+4], ' ') AS g
         |  FROM toks, unnest(range(1, len(t) - 3)) AS u(i) WHERE len(t) >= 5),
         |df AS (SELECT g, count(*) AS nd FROM grams GROUP BY g),
         |per AS (SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
         |  FROM grams JOIN df USING (g) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(coalesce(n_boiler, 0) AS BIGINT) AS n_boiler,
         |  round(CAST(n_boiler AS DOUBLE) / nullif(CAST(n_grams AS DOUBLE), 0.0), 9) AS boiler_frac
         |FROM documents d LEFT JOIN per USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      boilerplate(Tables.documents(s, d))
    },

    Q("token_entropy",
      s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
         |ex AS (SELECT doc_id, unnest(t) AS w FROM toks),
         |tf AS (SELECT doc_id, w, count(*) AS c FROM ex GROUP BY doc_id, w),
         |agg AS (SELECT doc_id,
         |  CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_unique,
         |  list(CAST(c AS DOUBLE) ORDER BY w) AS cs
         |  FROM tf GROUP BY doc_id)
         |SELECT doc_id, n_tokens, n_unique,
         |  round(list_sum(list_transform(cs,
         |    c -> -(c / n_tokens) * log2(c / n_tokens))), 6) AS entropy
         |FROM agg ORDER BY doc_id""".stripMargin) { (s, d) =>
      tokenEntropy(Tables.documents(s, d))
    },

    // X67: WITHIN-document repetition signals (Gopher §A.1.1's
    // duplicate-n-gram family) — the self-repetition gate that catches
    // looping generators and scraped spam, complementary to X23's
    // cross-document boilerplate: dup fraction of 2-grams and 5-grams
    // (1 − distinct/total) and the top-bigram share. One pass: both
    // gram sizes explode from the same scan with a size tag, then one
    // (doc, n, gram) hash agg and one per-doc conditional agg — a doc's
    // signals never see another doc, so the shuffle keys are (doc, gram)
    // then doc, both high-cardinality. Docs too short for a gram size
    // keep NULL fractions (0/0) on the document spine in both engines.
    Q("repetition_signals",
      s"""WITH pd AS (SELECT doc_id, $duckToks AS t FROM documents),
         |g2 AS (SELECT doc_id, array_to_string(t[u.i:u.i+1], ' ') AS g
         |  FROM pd, unnest(range(1, len(t))) AS u(i) WHERE len(t) >= 2),
         |g5 AS (SELECT doc_id, array_to_string(t[u.i:u.i+4], ' ') AS g
         |  FROM pd, unnest(range(1, len(t) - 3)) AS u(i) WHERE len(t) >= 5),
         |tf2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
         |tf5 AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY doc_id, g),
         |p2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tot2,
         |  CAST(count(*) AS BIGINT) AS uniq2, CAST(max(c) AS BIGINT) AS top2
         |  FROM tf2 GROUP BY doc_id),
         |p5 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tot5,
         |  CAST(count(*) AS BIGINT) AS uniq5 FROM tf5 GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(tot2, 0) AS n_2grams,
         |  coalesce(tot5, 0) AS n_5grams,
         |  round(1.0 - CAST(uniq2 AS DOUBLE) / nullif(CAST(tot2 AS DOUBLE), 0.0), 9) AS dup_2gram_frac,
         |  round(CAST(top2 AS DOUBLE) / nullif(CAST(tot2 AS DOUBLE), 0.0), 9) AS top_2gram_frac,
         |  round(1.0 - CAST(uniq5 AS DOUBLE) / nullif(CAST(tot5 AS DOUBLE), 0.0), 9) AS dup_5gram_frac
         |FROM documents d LEFT JOIN p2 ON d.doc_id = p2.doc_id
         |  LEFT JOIN p5 ON d.doc_id = p5.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val grams = docs.select(col("doc_id"), lit(2).as("n"),
          explode(TextFns.ngrams(col("text"), 2)).as("g"))
        .union(docs.select(col("doc_id"), lit(5).as("n"),
          explode(TextFns.ngrams(col("text"), 5)).as("g")))
      val tf = grams.groupBy("doc_id", "n", "g").agg(count(lit(1)).as("c"))
      val per = tf.groupBy("doc_id").agg(
        sum(when(col("n") === 2, col("c"))).as("tot2"),
        count(when(col("n") === 2, lit(1))).as("uniq2"),
        max(when(col("n") === 2, col("c"))).as("top2"),
        sum(when(col("n") === 5, col("c"))).as("tot5"),
        count(when(col("n") === 5, lit(1))).as("uniq5"))
      docs.select(col("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("tot2"), lit(0L)).as("n_2grams"),
          coalesce(col("tot5"), lit(0L)).as("n_5grams"),
          round(lit(1.0) - try_divide(col("uniq2").cast("double"),
            nullif(col("tot2").cast("double"), lit(0.0))), 9).as("dup_2gram_frac"),
          round(try_divide(col("top2").cast("double"),
            nullif(col("tot2").cast("double"), lit(0.0))), 9).as("top_2gram_frac"),
          round(lit(1.0) - try_divide(col("uniq5").cast("double"),
            nullif(col("tot5").cast("double"), lit(0.0))), 9).as("dup_5gram_frac"))
        .orderBy("doc_id")
    }
  )
}
