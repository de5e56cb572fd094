package graft.operators

import graft.Q
import graft.functions.Sketches
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bloom-filter semi-join reduction (the sketch-family sibling of HLL
  * and count-min: HLL answers "how many", CMS "how often", Bloom "is it
  * in the set"). The build side aggregates dimension keys into one
  * fixed-size bit array (a single row); the probe side broadcasts it and
  * drops fact rows whose keys cannot be in the set BEFORE the exact
  * join. False positives are removed by the exact semi join that
  * follows, so the end result is IDENTICAL to the plain semi join — the
  * bloom only cuts the fact rows that reach the join's shuffle/build.
  *
  * This is the manual, user-controllable form of the runtime bloom
  * pruning Spark's `InjectRuntimeFilter` applies (PlanAuditSpec pins
  * that rule firing on a selective join); the explicit operator works
  * where the planner declines (pre-filtering a SINK, feeding a
  * non-join consumer, or persisting the filter for reuse across jobs —
  * at 100 TB a dimension bloom is built once and shipped to every
  * downstream scan).
  *
  * Probe arithmetic mirrors [[Sketches.BloomAgg]] exactly: both hashes
  * are reduced mod numBits at the source (so pos_i = (h1 + i·h2) mod
  * numBits never exceeds ~2^20 — ANSI mode would throw on long
  * overflow, so the arithmetic must be overflow-free by construction),
  * evaluated with builtin getbit/element_at only (codegen, no UDF in
  * the per-row path).
  */
object BloomJoin {

  /** 2^17 bits (16 KiB) / 5 probes: <0.1% FP at ~6k inserted keys
    * (sf0.1 BUILDING customers), still <5% at 10× that. */
  private val NumBits = 1 << 17
  private val K = 5

  /** (h1, h2) probe hashes of a key column, pre-reduced mod numBits so
    * downstream position arithmetic cannot overflow; h2 forced odd (and
    * numBits is a power of two, so odd ⇒ coprime) so the double-hash
    * step never collapses to a single position. */
  def probeHashes(key: Column): (Column, Column) =
    (pmod(xxhash64(key), lit(NumBits.toLong)),
     pmod(xxhash64(key, lit(7)), lit(NumBits.toLong)).bitwiseOR(lit(1L)))

  /** Build a one-row bloom DataFrame (column `bloom`) over `key`. */
  def build(dim: DataFrame, key: Column): DataFrame = {
    val (h1, h2) = probeHashes(key)
    dim.select(h1.as("h1"), h2.as("h2"))
      .agg(Sketches.bloom(NumBits, K)(col("h1"), col("h2")).as("bloom"))
  }

  /** Membership probe: true iff all K probe bits are set. */
  def mightContain(bloomArr: Column, key: Column): Column = {
    val (h1, h2) = probeHashes(key)
    (0 until K).map { i =>
      val pos = pmod(h1 + lit(i.toLong) * h2, lit(NumBits.toLong))
      val word = element_at(bloomArr, (pos / 64).cast("int") + 1)
      call_function("getbit", word, (pos % 64).cast("int")) === 1
    }.reduce(_ && _)
  }

  /** Fact rows bloom-pre-filtered then EXACTLY semi-joined: equal to the
    * plain semi join, minus most of the join-input volume. */
  def semiReduce(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String): DataFrame = {
    val filtered = fact
      .join(broadcast(build(dim, col(dimKey))))
      .filter(mightContain(col("bloom"), col(factKey)))
      .drop("bloom")
    filtered.join(dim.select(col(dimKey)), col(factKey) === col(dimKey), "left_semi")
  }

  def all: Seq[Q] = Seq(

    // Orders of BUILDING-segment customers via bloom + exact semi join;
    // the oracle is the plain IN-subquery — identical output by
    // construction (the bloom admits no false negatives and the exact
    // join removes its false positives).
    Q("bloom_semi_reduction",
      """SELECT o.o_orderpriority, count(*) AS n_orders,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
        |FROM orders o
        |WHERE o.o_custkey IN (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o.o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val dim = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      semiReduce(Tables.orders(s, d), "o_custkey", dim, "c_custkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(38, 4))).cast("double").as("total"))
        .orderBy("o_orderpriority")
    }
  )
}
