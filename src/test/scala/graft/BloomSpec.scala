package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom filter + semi-join reduction tests: zero false negatives,
  * bounded false-positive rate, merge/layout invariance, and the
  * reduction's exact-result guarantee. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def keys(lo: Long, hi: Long) = spark.range(lo, hi).toDF("k")

  test("no false negatives: every inserted key probes true, any layout") {
    val ins = keys(0, 5000)
    for (parts <- Seq(1, 7)) {
      val bloom = BloomJoin.build(ins.repartition(parts), col("k"))
      val missed = ins.join(broadcast(bloom))
        .filter(!BloomJoin.mightContain(col("bloom"), col("k")))
        .count()
      assert(missed == 0, s"bloom dropped $missed inserted keys at $parts partitions")
    }
  }

  test("false-positive rate bounded on disjoint probes") {
    val bloom = BloomJoin.build(keys(0, 5000), col("k"))
    val fp = keys(1000000, 1050000).join(broadcast(bloom))
      .filter(BloomJoin.mightContain(col("bloom"), col("k")))
      .count()
    // 2^17 bits / 5 hashes / 5k inserts → theoretical FP ≈ 2e-5;
    // assert an order of magnitude of slack, which still catches a
    // broken hash (≈100% FP) or a single-position degenerate (≈4%)
    assert(fp < 50000 * 0.01, s"$fp false positives in 50k disjoint probes")
  }

  test("semi-join reduction ≡ plain semi join, and the bloom actually filters") {
    val dim = sources.Tables.customer(spark, SparkTestSession.sf001)
      .filter(col("c_mktsegment") === "BUILDING")
    val fact = sources.Tables.orders(spark, SparkTestSession.sf001)
    val reduced = BloomJoin.semiReduce(fact, "o_custkey", dim, "c_custkey")
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    val plain = fact.join(dim.select("c_custkey"),
      col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(reduced == plain)
    // pre-filter selectivity: the bloom admits ~|dim|/|customers| of the
    // fact side (plus FP noise) — far fewer rows than the full fact table
    val admitted = fact.join(broadcast(BloomJoin.build(dim, col("c_custkey"))))
      .filter(BloomJoin.mightContain(col("bloom"), col("o_custkey")))
      .count()
    assert(admitted < fact.count(), "bloom pre-filter must drop non-members before the join")
    assert(admitted >= plain.size, "pre-filter can never drop true members")
  }
}
