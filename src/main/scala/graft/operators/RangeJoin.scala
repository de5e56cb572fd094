package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned interval join (X26): point-in-interval matching WITHOUT an
  * equi-key. The naive plan for `point BETWEEN lo AND hi` is a
  * broadcast-nested-loop join — O(|probe|·|intervals|) comparisons, the
  * classic 100 TB scale killer. The binned form turns it into an
  * EQUI-join: quantize the value domain into fixed-width bins, explode
  * each interval into the bins it covers, map each probe point to its
  * single bin, hash-join on bin id, then apply the exact range residual.
  * Work becomes O(|probe| + |intervals|·bins_per_interval + |matches|),
  * all shuffle-partitioned by bin id.
  *
  * Bin width is (domain span / 256) computed from a single-row global
  * aggregate that rides into both sides as a broadcast — quantization
  * only AFFECTS ROUTING; correctness comes from the residual filter, so
  * float arithmetic here carries no oracle-parity risk.
  *
  * Intervals here: per-nation [min, min + span/4] of customer order
  * totals — irregular and overlapping, so no closed-form bin assignment
  * exists (the case that forces a real interval join).
  */
object RangeJoin {

  private val priceD = org.apache.spark.sql.types.DataTypes
    .createDecimalType(28, 4)

  def binnedIntervalJoin(orders: DataFrame, customer: DataFrame): DataFrame = {
    val iv = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(min(col("o_totalprice")).as("lo"),
        (min(col("o_totalprice")) +
          (max(col("o_totalprice")) - min(col("o_totalprice"))) / 4.0).as("hi"))

    // single-row global domain stats, broadcast into both sides
    val g = orders.agg(min(col("o_totalprice")).as("gmin"),
      max(col("o_totalprice")).as("gmax"))
    val w = (col("gmax") - col("gmin")) / 256.0

    val ivb = iv.crossJoin(broadcast(g))
      .select(col("c_nationkey"), col("lo"), col("hi"),
        explode(sequence(
          floor((col("lo") - col("gmin")) / w).cast("long"),
          floor((col("hi") - col("gmin")) / w).cast("long"))).as("bin"))

    val probe = orders.crossJoin(broadcast(g))
      .select(col("o_totalprice"),
        floor((col("o_totalprice") - col("gmin")) / w).cast("long").as("bin"))

    // one bin per probe point ⇒ each (point, interval) pair matches at
    // most once — no post-join dedup needed.
    probe.join(ivb, "bin")
      .filter(col("o_totalprice") >= col("lo") && col("o_totalprice") <= col("hi"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(priceD)).cast("double").as("total"))
      .orderBy("c_nationkey")
  }

  def all: Seq[Q] = Seq(
    Q("range_join_binned",
      """WITH iv AS (
        |  SELECT c_nationkey, min(o_totalprice) AS lo,
        |    min(o_totalprice) + (max(o_totalprice) - min(o_totalprice)) / 4.0 AS hi
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_nationkey)
        |SELECT iv.c_nationkey, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total
        |FROM orders JOIN iv
        |  ON o_totalprice BETWEEN iv.lo AND iv.hi
        |GROUP BY iv.c_nationkey ORDER BY iv.c_nationkey""".stripMargin) { (s, d) =>
      binnedIntervalJoin(Tables.orders(s, d), Tables.customer(s, d))
    }
  )
}
