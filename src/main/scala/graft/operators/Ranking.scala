package graft.operators

import graft.Q
import graft.functions.TextFns
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** BM25 relevance ranking (X45) — the IR scoring step past X4's TF-IDF:
  * score every document against a query term set with the
  * length-normalized saturating tf weight production search uses.
  *
  * Plan shape (all broadcast sides are tiny by construction):
  * tokenize → per-doc length + per-(doc,term) tf restricted to the query
  * terms (the filter runs BEFORE the tf aggregation, so the shuffled tf
  * table is |hits| rows, not |tokens|) → broadcast-join term df and the
  * one-row corpus stats → per-term score → decimal sum per doc. Corpus
  * stats (N, Σdl) ride in as a broadcast single row — never a collect.
  *
  * Cross-engine float discipline (same contract as pagerank_trade):
  * every constant is written as the SAME literal on both sides rather
  * than derived at runtime — derivations are safe only when exact in
  * binary (1.2+1.0 happens to equal double("2.2"), but 1.0−0.85 is one
  * ulp OFF double("0.15")), so literals-only is the rule that never
  * needs a per-constant proof. Every int→double promotion is explicit, and
  * the only libm call is one ln per (doc, term). Per-term scores are
  * accumulated as DECIMAL(38,12) so the 3-row per-doc sum cannot depend
  * on aggregation order; output rounds to 6 dp.
  */
object Ranking {

  /** Query terms — mid-frequency corpus vocabulary so scores spread. */
  private val Terms = Seq("hash", "join", "window")

  def all: Seq[Q] = Seq(

    Q("bm25_rank",
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9\s]+', '', 'g')), '\s+'), t -> len(t) > 0)) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT count(*) AS nd, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term IN ('hash', 'join', 'window') GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
        |SELECT tf.doc_id, count(*) AS n_terms,
        |  round(CAST(SUM(CAST(
        |    ln(1.0 + (CAST(nd - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
        |      * ((CAST(tf AS DOUBLE) * 2.2)
        |         / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl * nd AS DOUBLE) / CAST(sumdl AS DOUBLE)))))
        |    AS DECIMAL(38,12))) AS DOUBLE), 6) AS score
        |FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        |GROUP BY tf.doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("nd"), sum(col("dl")).as("sumdl"))
      val tf = toks.filter(col("term").isInCollection(Terms))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val idf = log(lit(1.0) +
        ((col("nd") - col("df")).cast("double") + lit(0.5)) / (col("df").cast("double") + lit(0.5)))
      val rdl = (col("dl") * col("nd")).cast("double") / col("sumdl").cast("double")
      val perTerm = idf * ((col("tf").cast("double") * lit(2.2)) /
        (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) * rdl)))
      tf.join(broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), perTerm.cast(DecimalType(38, 12)).as("c"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"),
          round(sum(col("c")).cast("double"), 6).as("score"))
        .orderBy("doc_id")
    }
  )
}
