package graft.operators

import graft.Q
import graft.functions.TextFns
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Training-corpus preparation operators: fixed-size token chunking with
  * overlap (the sequence-packing precursor every LLM data pipeline runs
  * before tokenizer-level packing) and benchmark-contamination screening
  * (n-gram collision rate of each training document against a held-out
  * eval set — the decontamination gate run before any corpus ships).
  *
  * Both are deterministic and engine-portable by construction (no RNG,
  * no float accumulation order): chunk boundaries are integer arithmetic
  * over the S1-normalized token stream (reference/WordCount.java:76-79
  * semantics, same tokenizer as the flagship n-gram pipeline), and
  * contamination is exact 8-gram set intersection.
  *
  * 100 TB posture:
  *   - chunking is scan-local (normalize → tokenize → explode happen
  *     inside one stage; no shuffle at all until the output sort);
  *   - contamination joins the corpus' distinct (doc, gram) pairs
  *     against the eval gram set on the gram string. The eval side is a
  *     benchmark (thousands of documents, not billions) so it is
  *     broadcast — the corpus side never shuffles; with a huge eval set
  *     the same plan degrades gracefully to a shuffled semi-join on the
  *     gram.
  */
object TrainingPrep {

  /** Chunk size / stride in tokens. Stride < size → 8-token overlap so
    * no boundary-spanning context is lost (standard LM-pretraining
    * windowing). */
  private val ChunkLen = 32
  private val Stride = 24

  /** Every 97th doc_id plays the "benchmark eval set" role; the rest are
    * the training corpus being screened. */
  private val EvalMod = 97

  /** Max tokens per packed training bin (pack_greedy_tokens). */
  private val PackBudget = 512

  /** Greedy sequential packing: fold (group, doc_id, n_tok) rows into
    * fixed-budget bins, in doc_id order within each group, opening a new
    * bin when the next doc would overflow. An oversized doc (> budget
    * alone) lands in a bin of its own: it never overflows an EMPTY bin
    * at entry (fill = 0), and the doc after it always opens a new bin.
    * Input must have columns (doc_id, n_tok) plus the `groupCols`;
    * output adds `bin` (0-based per group). */
  def packGreedy(docs: org.apache.spark.sql.DataFrame, budget: Int,
      groupCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val folded = docs.groupBy(groupCols.map(col): _*)
      // array_sort on (doc_id, n_tok) structs = doc_id order (unique key)
      .agg(array_sort(collect_list(struct(col("doc_id"), col("n_tok")))).as("ds"))
      .withColumn("bins", aggregate(
        col("ds"),
        struct(lit(0).as("bin"), lit(0L).as("fill"),
          array().cast("array<int>").as("bins")),
        (acc, x) => {
          val over = acc.getField("fill") > 0 &&
            acc.getField("fill") + x.getField("n_tok") > budget
          val nb = when(over, acc.getField("bin") + 1).otherwise(acc.getField("bin"))
          struct(nb.as("bin"),
            when(over, x.getField("n_tok"))
              .otherwise(acc.getField("fill") + x.getField("n_tok")).as("fill"),
            concat(acc.getField("bins"), array(nb)).as("bins"))
        },
        acc => acc.getField("bins")))
    folded
      .select(groupCols.map(col) :+ explode(arrays_zip(col("ds"), col("bins"))).as("z"): _*)
      .select(groupCols.map(col) ++ Seq(
        col("z.ds.doc_id").as("doc_id"), col("z.ds.n_tok").as("n_tok"),
        col("z.bins").as("bin")): _*)
  }

  /** Contamination gram length. Published decontamination setups use
    * 8–13-token shingles; the synthetic driver corpus draws ~45 distinct
    * words, so grams that long never collide across documents and the
    * screen would be vacuously zero. 3 keeps the identical plan shape
    * while giving the intersection path real hits to count. */
  private val GramN = 3

  def all: Seq[Q] = Seq(

    // Fixed-size overlapping token chunks per document. A doc with n
    // tokens yields 1 chunk if n <= 32, else ceil((n-32)/24)+1 — every
    // token is covered, consecutive chunks share 8 tokens, and only the
    // last chunk may be short. Chunk boundaries depend only on (doc,
    // token index), so the output is identical across engines, runs,
    // and cluster sizes.
    Q("training_chunks",
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9\\s]+', '', 'g')), '\\s+'),
         |                t -> len(t) > 0) AS t
         |  FROM documents),
         |nn AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
         |ch AS (
         |  SELECT doc_id, u.i AS chunk_idx,
         |         t[u.i*$Stride+1 : least(u.i*$Stride+$ChunkLen, n)] AS c
         |  FROM nn, unnest(range(0,
         |    CASE WHEN n <= $ChunkLen THEN 1
         |         ELSE CAST(ceil((n-$ChunkLen)/$Stride.0) AS BIGINT)+1 END)) AS u(i))
         |SELECT doc_id, chunk_idx, len(c) AS n_tok, array_to_string(c, ' ') AS chunk_text
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      val toks = TextFns.tokens(col("text"))
      val n = size(col("t"))
      // ceil((n-C)/S) in integer arithmetic; floor() of the int division
      // keeps everything LongType (no double rounding at any n).
      val nChunks = when(n <= ChunkLen, lit(1L))
        .otherwise(floor((n - ChunkLen + (Stride - 1)) / lit(Stride)) + 1L)
      Tables.documents(s, d)
        .select(col("doc_id"), toks.as("t"))
        .filter(size(col("t")) > 0)
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(0L), nChunks - 1L)).as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          slice(col("t"), (col("chunk_idx") * Stride + 1).cast("int"), lit(ChunkLen)).as("c"))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("c")).cast("long").as("n_tok"),
          array_join(col("c"), " ").as("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    },

    // Benchmark-contamination screen: for each training document, the
    // fraction of its DISTINCT 8-grams that also occur anywhere in the
    // eval set (doc_id % 97 == 0). Docs shorter than 8 tokens have no
    // grams and drop out (they cannot be contaminated at this gram
    // size). frac is a ratio of exact integers, rounded once for
    // display.
    Q("contamination_screen",
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9\\s]+', '', 'g')), '\\s+'),
         |                t -> len(t) > 0) AS t
         |  FROM documents),
         |ng AS (
         |  SELECT doc_id, array_to_string(t[u.i:u.i+${GramN - 1}], ' ') AS gram
         |  FROM toks, unnest(range(1, len(t) - ${GramN - 2})) AS u(i)
         |  WHERE len(t) >= $GramN),
         |eval_grams AS (
         |  SELECT DISTINCT gram FROM ng WHERE doc_id % $EvalMod = 0),
         |train_grams AS (
         |  SELECT DISTINCT doc_id, gram FROM ng WHERE doc_id % $EvalMod <> 0)
         |SELECT tg.doc_id,
         |  count(*) AS n_grams,
         |  count(eg.gram) AS n_hit,
         |  round(CAST(count(eg.gram) AS DOUBLE) / count(*), 6) AS contamination
         |FROM train_grams tg LEFT JOIN eval_grams eg ON tg.gram = eg.gram
         |GROUP BY tg.doc_id ORDER BY tg.doc_id""".stripMargin) { (s, d) =>
      val grams = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFns.ngrams(col("text"), GramN)).as("gram"))
      val evalGrams = grams.filter(col("doc_id") % EvalMod === 0)
        .select(col("gram").as("eval_gram")).distinct()
      val trainGrams = grams.filter(col("doc_id") % EvalMod =!= 0)
        .select("doc_id", "gram").distinct()
      trainGrams
        .join(broadcast(evalGrams), col("gram") === col("eval_gram"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"), count(col("eval_gram")).as("n_hit"))
        .select(col("doc_id"), col("n_grams"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_grams"), 6).as("contamination"))
        .orderBy("doc_id")
    },

    // X48 greedy sequence packing: assign whole documents to fixed-budget
    // training bins (max 512 tokens per bin), first-come in doc_id
    // order, opening a new bin when the next doc would overflow —
    // the tokenizer-level packing step that turns a chunked corpus
    // into fixed-length training sequences with minimal padding.
    //
    // The fold is SEQUENTIAL by nature (bin state carries across
    // docs), which no window function expresses; the scale answer is
    // the same one real packers use: pack within a SHARD, not
    // globally — greedy packing has no cross-shard quality benefit,
    // so the corpus is hash-sharded (here doc_id % 16; shard count
    // grows with the corpus) and each task folds one (lang, shard)
    // group via the `aggregate` HOF over the sorted doc array. No
    // low-cardinality funnel: parallelism = langs × shards.
    //
    // Engine parity: the fold is integer arithmetic only (token
    // counts, bin ids) in identical order (doc_id sort), so Spark's
    // HOF fold and DuckDB's recursive-CTE step produce identical
    // rows. An oversized doc (> 512 tokens alone) occupies its own
    // bin: it enters the current bin only when that bin is empty
    // (fill = 0 ⇒ never "overflows" at entry), and the next doc
    // always opens a new bin.
    Q("pack_greedy_tokens",
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, lang, doc_id % 16 AS shard,
         |    len(list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9\\s]+', '', 'g')), '\\s+'),
         |                    t -> len(t) > 0)) AS n_tok
         |  FROM documents),
         |ord AS (
         |  SELECT doc_id, lang, shard, n_tok,
         |    row_number() OVER (PARTITION BY lang, shard ORDER BY doc_id) AS rn
         |  FROM toks),
         |rec AS (
         |  SELECT lang, shard, rn, doc_id, n_tok, 0 AS bin, n_tok AS fill
         |  FROM ord WHERE rn = 1
         |  UNION ALL
         |  -- fill > 0 guard matches the Spark fold exactly: an EMPTY bin
         |  -- never overflows at entry (a zero-token doc leading the group,
         |  -- or the doc right after an oversized one, must not burn a bin)
         |  SELECT o.lang, o.shard, o.rn, o.doc_id, o.n_tok,
         |    CASE WHEN r.fill > 0 AND r.fill + o.n_tok > $PackBudget THEN r.bin + 1 ELSE r.bin END,
         |    CASE WHEN r.fill > 0 AND r.fill + o.n_tok > $PackBudget THEN o.n_tok ELSE r.fill + o.n_tok END
         |  FROM rec r JOIN ord o
         |    ON o.lang = r.lang AND o.shard = r.shard AND o.rn = r.rn + 1)
         |SELECT lang, shard, doc_id, n_tok, bin
         |FROM rec ORDER BY lang, shard, doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("lang"), pmod(col("doc_id"), lit(16)).as("shard"),
          col("doc_id"), size(TextFns.tokens(col("text"))).cast("long").as("n_tok"))
      packGreedy(docs, PackBudget, Seq("lang", "shard"))
        .orderBy("lang", "shard", "doc_id")
    },

    // X54: per-group feature scaling — min-max to [0,1] and z-score of
    // each lineitem price within its return-flag stratum, the
    // normalize-before-training step of any tabular feature pipeline.
    // Group stats are ONE aggregation (min/max exact; mean/std from
    // exact decimal power sums, the stat_aggregates discipline)
    // broadcast back into the scan — two passes total, no window over
    // the fact table, no per-row state. Final scaling is identical
    // double arithmetic on both engines.
    Q("feature_scale",
      """WITH g AS (
        |  SELECT l_returnflag,
        |    count(*) AS n,
        |    min(CAST(l_extendedprice AS DOUBLE)) AS mn,
        |    max(CAST(l_extendedprice AS DOUBLE)) AS mx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS s2
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
        |  round((CAST(l.l_extendedprice AS DOUBLE) - g.mn) / (g.mx - g.mn), 9) AS x_minmax,
        |  round((CAST(l.l_extendedprice AS DOUBLE) - g.s1 / g.n)
        |    / sqrt((g.s2 - g.s1 * g.s1 / g.n) / (g.n - 1)), 9) AS x_z
        |FROM lineitem l JOIN g USING (l_returnflag)
        |ORDER BY l.l_orderkey, l.l_linenumber, l.l_returnflag, x_minmax, x_z""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val x = col("l_extendedprice").cast("double")
      val g = Tables.spread(s, d, "lineitem").groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          min(x).as("mn"), max(x).as("mx"),
          sum(x.cast(DecimalType(18, 2))).cast("double").as("s1"),
          sum((x * x).cast(DecimalType(38, 4))).cast("double").as("s2"))
      Tables.spread(s, d, "lineitem")
        .join(broadcast(g), "l_returnflag")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          round((x - col("mn")) / (col("mx") - col("mn")), 9).as("x_minmax"),
          round((x - col("s1") / col("n"))
            / sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)), 9).as("x_z"))
        // (l_orderkey, l_linenumber) is NOT a key in the synthetic
        // lineitem (unlike TPC-H's PK) — the value columns complete a
        // TOTAL order, so engines can't disagree on tie placement.
        // Surfaced by the 10x compare: sf0.1 passed only because both
        // engines happened to break the ties identically.
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "x_minmax", "x_z")
    },

    // X78: group-mean null imputation — fill a feature's missing values
    // with its stratum's mean, flagging imputed rows (the fill step
    // before X54's scaling in any tabular training pipeline; the flag
    // column is itself a standard model feature). Missingness is
    // derived deterministically (keys ≡ 0 mod 7 → NULL) so both
    // engines impute identical inputs. Group means come from one
    // aggregation over the NON-NULL values (exact DECIMAL sum ÷
    // non-null count — SUM and count(col) skip NULLs identically in
    // both engines) broadcast back into the scan; same two-pass
    // no-window shape as feature_scale.
    Q("impute_missing",
      """WITH w AS (
        |  SELECT l_orderkey, l_linenumber, l_returnflag,
        |    CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE l_quantity END AS q
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(q AS DECIMAL(18,2))) AS DOUBLE) / count(q) AS mean_q
        |  FROM w GROUP BY l_returnflag)
        |SELECT w.l_orderkey, w.l_linenumber, w.l_returnflag,
        |  round(coalesce(CAST(q AS DOUBLE), mean_q), 6) AS q_imputed,
        |  (q IS NULL) AS was_imputed
        |FROM w JOIN m ON w.l_returnflag = m.l_returnflag
        |ORDER BY l_orderkey, l_linenumber, w.l_returnflag, q_imputed, was_imputed""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val withNulls = Tables.spread(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          when(pmod(col("l_orderkey"), lit(7)) === 0, lit(null))
            .otherwise(col("l_quantity")).as("q"))
      val means = withNulls.groupBy("l_returnflag")
        .agg((sum(col("q").cast(DecimalType(18, 2))).cast("double")
          / count(col("q"))).as("mean_q"))
      withNulls.join(broadcast(means), "l_returnflag")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          round(coalesce(col("q").cast("double"), col("mean_q")), 6).as("q_imputed"),
          col("q").isNull.as("was_imputed"))
        // total order for the same non-PK reason as feature_scale —
        // including was_imputed: an imputed row whose group mean rounds
        // (6dp) to a present quantity on a duplicated key would
        // otherwise still tie-order differently across engines
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "q_imputed", "was_imputed")
    }
  )
}
