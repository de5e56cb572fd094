package graft

import java.util.concurrent.atomic.AtomicLong
import graft.operators.Skew
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X7 skew stress (VERDICT r03 item 6): a 1-hot-key join — half of all
  * fact rows on a single key — must NOT funnel the hot key's rows into
  * one shuffle task. Verifies BOTH mitigations with measured per-task
  * shuffle-read record counts from a TaskEnd listener:
  *   - [[Skew.saltedJoin]] spreads the hot key over `saltBuckets`
  *     partitions (works for any join/agg, AQE or not);
  *   - AQE's skew-join split handles the sort-merge case on its own
  *     (`skew=true` in the executed plan) once partition sizes exceed
  *     its thresholds.
  * Measured at sf0.1 (~600k lineitem rows, ~300k on the hot key) at 64
  * shuffle partitions — the suite default of 4 reducers caps the best
  * possible salting win at total/4 ≈ 2.5× and keeps the hot partition's
  * compressed shuffle bytes under AQE's skew threshold, hiding both
  * effects. Numbers recorded in BASELINE.md. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** lineitem with a planted hot key: even orderkeys (≈50% of rows) →
    * key -1; the rest spread over 1000 keys. Deterministic. */
  private def skewedFacts: DataFrame =
    sources.Tables.lineitem(spark, SparkTestSession.sf01)
      .select(
        when(pmod(col("l_orderkey"), lit(2)) === 0, lit(-1L))
          .otherwise(pmod(col("l_orderkey"), lit(1000))).as("key"),
        col("l_orderkey"), col("l_quantity"))

  private def dim: DataFrame =
    spark.range(-1L, 1000L).toDF("key")
      .withColumn("weight", (col("key") % 7 + 1).cast("double"))

  /** Max shuffle-read records over all tasks of jobs run inside `f`
    * (listener delivery is async — settle before reading). */
  private def maxTaskShuffleRecords(f: => Unit): Long = {
    val max = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          max.getAndAccumulate(m.shuffleReadMetrics.recordsRead, math.max)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try { f; SparkTestSession.settle(max.get()) }
    finally spark.sparkContext.removeSparkListener(listener)
  }

  private def withConf(pairs: (String, String)*)(f: => Unit): Unit =
    SparkTestSession.withConf(pairs: _*)(f)

  test("saltedJoin bounds the hot key's max task; plain shuffle join does not") {
    // AQE off + broadcast off: isolate salting — the plain join must
    // show the raw funnel (hot key's ~300k rows in ONE task)
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "64") {
      val total = skewedFacts.count()
      val hot = skewedFacts.filter(col("key") === -1L).count()
      assert(hot >= total * 2 / 5, s"hot key carries $hot of $total — not skewed enough")

      val plainMax = maxTaskShuffleRecords {
        skewedFacts.join(dim, "key")
          .agg(sum(col("l_quantity") * col("weight"))).collect()
      }
      assert(plainMax >= hot,
        s"plain join max task read $plainMax < hot-key rows $hot — premise broken")

      val buckets = 32
      // salt from l_orderkey (~300k distinct on the hot key) — a
      // low-cardinality salt source like l_quantity (50 values) would
      // collapse into few salt buckets and the spread bound would hold
      // on hash luck rather than by construction
      val saltedMax = maxTaskShuffleRecords {
        Skew.saltedJoin(skewedFacts, dim, "key", buckets,
            saltSource = Seq("l_orderkey"))
          .agg(sum(col("l_quantity") * col("weight"))).collect()
      }
      // hot key spread over `buckets` salts: max task ≈ hot/buckets plus
      // its share of the cold keys; 4× headroom over the ideal absorbs
      // salt-bucket hash collisions across the 64 reducers while staying
      // far from a funnel (which would be ≥ hot ≈ 300k)
      val ideal = hot / buckets + (total - hot) / 64
      assert(saltedMax <= ideal * 4,
        s"salted max task $saltedMax > 4× ideal $ideal — salting not spreading")
      assert(saltedMax * 4 <= plainMax,
        s"salted max $saltedMax not ≥4× better than plain $plainMax")
      info(s"sf0.1 skew join: total=$total hot=$hot plainMaxTask=$plainMax " +
        s"saltedMaxTask=$saltedMax (buckets=$buckets)")
    }
  }

  test("saltedJoinGated: salts the hot fixture, plain-joins the uniform one, same results") {
    // VERDICT r08 task 3: the gate must SWITCH — measured skew decides,
    // not a hardwired salt. Equality oracle on all branches is the plain
    // join's aggregated result.
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "64") {
      def summarize(df: DataFrame): Seq[(Long, Long, Double)] =
        df.groupBy("key")
          .agg(count(lit(1)).as("n"), sum(col("l_quantity") * col("weight")).as("v"))
          .collect().map(r => (r.getLong(0), r.getLong(1),
            math.rint(r.getDouble(2) * 100) / 100)).toSeq.sortBy(_._1)

      val threshold = 10000L

      // skewed: hot key -1 carries ~300k rows ≫ threshold → hybrid path
      val gatedSkewed = Skew.saltedJoinGated(skewedFacts, dim, "key",
        saltBuckets = 32, saltSource = Seq("l_orderkey"),
        hotKeyRowThreshold = threshold)
      assert(gatedSkewed.queryExecution.optimizedPlan.toString.contains("__salt"),
        "gated join on the skewed fixture must take a salting branch")
      assert(summarize(gatedSkewed) === summarize(skewedFacts.join(dim, Seq("key"))))

      // uniform: same rows, key spread evenly over 1000 values (max
      // rows/key ≈ 600 ≪ threshold) → plain-join branch, no salt anywhere
      val uniformFacts = skewedFacts
        .withColumn("key", pmod(col("l_orderkey"), lit(1000)))
      val gatedUniform = Skew.saltedJoinGated(uniformFacts, dim, "key",
        saltBuckets = 32, saltSource = Seq("l_orderkey"),
        hotKeyRowThreshold = threshold)
      assert(!gatedUniform.queryExecution.optimizedPlan.toString.contains("__salt"),
        "gated join on the uniform fixture must NOT pay the salting tax")
      assert(summarize(gatedUniform) === summarize(uniformFacts.join(dim, Seq("key"))))

      // degenerate cap: maxHotKeys=0 forces the everything-is-hot branch
      // (uniformly heavy distribution) — full salt, still exact results
      val gatedAllHot = Skew.saltedJoinGated(skewedFacts, dim, "key",
        saltBuckets = 32, saltSource = Seq("l_orderkey"),
        hotKeyRowThreshold = 1L, maxHotKeys = 0)
      assert(gatedAllHot.queryExecution.optimizedPlan.toString.contains("__salt"))
      assert(summarize(gatedAllHot) === summarize(skewedFacts.join(dim, Seq("key"))))
    }
  }

  test("saltedJoinGated hybrid branch bounds the hot key's max task like full salting") {
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "64") {
      val total = skewedFacts.count()
      val hot = skewedFacts.filter(col("key") === -1L).count()
      val buckets = 32
      val gatedMax = maxTaskShuffleRecords {
        Skew.saltedJoinGated(skewedFacts, dim, "key", buckets,
            saltSource = Seq("l_orderkey"), hotKeyRowThreshold = 10000L)
          .agg(sum(col("l_quantity") * col("weight"))).collect()
      }
      val ideal = hot / buckets + (total - hot) / 64
      assert(gatedMax <= ideal * 4,
        s"gated hybrid max task $gatedMax > 4x ideal $ideal — hot rows not spread")
      info(s"sf0.1 gated skew join: total=$total hot=$hot gatedMaxTask=$gatedMax")
    }
  }

  test("AQE skew-join split engages on the same hot key (skew=true in plan)") {
    // thresholds lowered because sf0.1's hot partition is only ~600 KB
    // of lz4-compressed (key, double) shuffle blocks; production
    // defaults (256 MB) target real cluster scale
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "64") {
      // AQE splits a skewed reduce partition along MAP-output boundaries;
      // sf0.1's lineitem is one parquet scan task, so the hot partition
      // would be a single unsplittable block. Fan the maps out to 32 (a
      // real cluster has thousands of scan tasks; this is test-scale only).
      val hot = skewedFacts.filter(col("key") === -1L).count()
      val df = skewedFacts.repartition(32).join(dim, "key")
        .agg(sum(col("l_quantity") * col("weight")))
      val aqeMax = maxTaskShuffleRecords { df.collect() }
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed SMJ partition for splitting:\n$plan")
      // the numeric bound, not just the plan marker (VERDICT r04 item
      // 7): a SPLIT hot partition means no task reads anywhere near the
      // full hot key — ≤ hot/2 proves at least a 2-way split actually
      // executed (the un-split funnel reads ≥ hot ≈ 300k records)
      assert(aqeMax <= hot / 2,
        s"AQE skew split max task read $aqeMax > hot/2 = ${hot / 2} — marked but not split")
      info(s"sf0.1 AQE skew join: hot=$hot aqeMaxTask=$aqeMax")
    }
  }
}
