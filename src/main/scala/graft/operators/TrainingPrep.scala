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
    }
  )
}
