package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Association / co-occurrence mining (X47): the market-basket pair
  * count — for every pair of parts ordered together, how often they
  * co-occur across orders — the first stage of frequent-itemset mining
  * and of co-occurrence embeddings (PMI matrices are built from exactly
  * this table).
  *
  * 100 TB posture: the pair generator is a SELF-JOIN KEYED ON THE
  * BASKET ID (l_orderkey — high cardinality, so the shuffle spreads),
  * never a global pairs cross-join; work per basket is quadratic in
  * basket size only (TPC-H-ish baskets are ≤ 7 lines; a real pipeline
  * caps pathological baskets upstream — a 10k-item basket is a data
  * bug, not a signal). The support filter runs inside the pair
  * aggregation (partial aggs map-side), and the final top-100 is
  * `TakeOrderedAndProject` — per-partition heaps, no global sort.
  */
object Associations {

  private[operators] val MinSupport = 2
  private val TopK = 100

  /** Canonicalized (part_a < part_b) co-order pair support counts —
    * the ONE definition of the co-occurrence pair table, shared by
    * cooccur_parts and the Graph triangle suite (which consumes pairs
    * at support ≥ [[MinSupport]] as its edge set). */
  private[operators] def pairSupport(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
    li.as("a")
      .join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("support"))
  }

  def all: Seq[Q] = Seq(

    // X47: co-occurring part pairs ranked by support. Pair identity is
    // canonicalized (part_a < part_b) so each unordered pair counts
    // once per ordered-line pair; duplicate part lines in one order
    // contribute multiplicatively in BOTH engines (raw co-occurrence,
    // not per-basket distinct — the PMI numerator).
    Q("cooccur_parts",
      s"""SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         |  count(*) AS support
         |FROM lineitem a JOIN lineitem b
         |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |GROUP BY part_a, part_b
         |HAVING count(*) >= $MinSupport
         |ORDER BY support DESC, part_a, part_b
         |LIMIT $TopK""".stripMargin) { (s, d) =>
      pairSupport(s, d)
        .filter(col("support") >= MinSupport)
        .orderBy(col("support").desc, col("part_a"), col("part_b"))
        .limit(TopK)
    }
  )
}
