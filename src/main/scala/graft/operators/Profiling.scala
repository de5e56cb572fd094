package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dataset profiling (the first thing run against a new 100 TB corpus):
  * per-column statistics in long form, and fixed-width histograms.
  *
  * `profile_columns` computes count / non-null / exact distinct / min /
  * max / sum for several measures in ONE logical aggregation. Multiple
  * exact `count(DISTINCT …)`s in a single agg plan through Spark's
  * Expand operator (each row fans out once per distinct-column, then one
  * shuffle keyed by (gid, value)) — the standard multi-distinct shape;
  * everything non-distinct rides the same pass as partial aggregates.
  * Sums go through DECIMAL(38,4) so both engines do order-independent
  * exact arithmetic (2-dp inputs), then surface as doubles.
  *
  * `histogram_quantity` is scan-local bucketing (floor((v-lo)/w) with
  * edge clamp) + one hash aggregation — the profile-time companion that
  * costs one shuffle of at most `nBuckets` rows per partition.
  */
object Profiling {

  private val d4 = DecimalType(38, 4)

  def all: Seq[Q] = Seq(

    Q("profile_columns",
      """SELECT 'l_discount' AS col_name, count(*) AS n_rows, count(l_discount) AS n_nonnull,
        |  count(DISTINCT l_discount) AS n_distinct,
        |  min(l_discount) AS min_v, max(l_discount) AS max_v,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(38,4))) AS DOUBLE) AS sum_v
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice', count(*), count(l_extendedprice),
        |  count(DISTINCT l_extendedprice),
        |  min(l_extendedprice), max(l_extendedprice),
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', count(*), count(l_quantity),
        |  count(DISTINCT l_quantity),
        |  min(l_quantity), max(l_quantity),
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_tax', count(*), count(l_tax),
        |  count(DISTINCT l_tax),
        |  min(l_tax), max(l_tax),
        |  CAST(SUM(CAST(l_tax AS DECIMAL(38,4))) AS DOUBLE)
        |FROM lineitem
        |ORDER BY col_name""".stripMargin) { (s, d) =>
      val cols = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
      val li = Tables.spread(s, d, "lineitem")
      // one aggregation node: 4 distinct-counts + 16 plain aggregates
      // (Expand fans each row into 5 streams; one job, one final shuffle)
      val wide = li.agg(
        count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(
          count(col(c)).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c"),
          min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"),
          sum(col(c).cast(d4)).cast("double").as(s"sum_$c"))): _*)
      // long form via stack (scan-local generate over the single row)
      val stackExpr = cols.map(c =>
        s"'$c', n_rows, nn_$c, nd_$c, min_$c, max_$c, sum_$c").mkString(", ")
      wide.selectExpr(
        s"stack(${cols.size}, $stackExpr) AS (col_name, n_rows, n_nonnull, n_distinct, min_v, max_v, sum_v)")
        .orderBy("col_name")
    },

    // Fixed-width histogram of l_quantity over [0, 50): 10 buckets of
    // width 5, values at the top edge clamped into the last bucket
    // (count 50.0 with [45,50)). Bucket ids and bounds are exact integer
    // /double arithmetic — identical across engines.
    Q("histogram_quantity",
      """WITH b AS (
        |  SELECT least(CAST(floor(l_quantity / 5) AS BIGINT), 9) AS bucket,
        |         l_extendedprice
        |  FROM lineitem WHERE l_quantity IS NOT NULL)
        |SELECT bucket,
        |  bucket * 5.0 AS lo, (bucket + 1) * 5.0 AS hi,
        |  count(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity").isNotNull)
        .select(least(floor(col("l_quantity") / 5).cast("long"), lit(9L)).as("bucket"),
          col("l_extendedprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast(d4)).cast("double").as("sum_price"))
        .select(col("bucket"), (col("bucket") * 5.0).as("lo"),
          ((col("bucket") + 1) * 5.0).as("hi"), col("n"), col("sum_price"))
        .orderBy("bucket")
    }
  )
}
