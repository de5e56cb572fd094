package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §4.4, X7).
  *
  * Hot keys (the reference's own partitioner concedes the hotspot at
  * reference/WordCount.java:55-59 — "the", "of the" dominate any n-gram
  * distribution) overload a single shuffle partition at scale. AQE's
  * skew-join splitting handles sort-merge joins; for cases it can't see
  * (e.g. aggregations, or forced shuffle-hash joins) the classic fix is
  * salting: widen the hot key by a deterministic salt, join/aggregate on
  * (key, salt), then combine.
  */
object Skew {

  /** Salted equi-join: `big ⋈ small` on `key`, with the big side salted
    * by a deterministic per-row hash and the small side exploded across
    * all `saltBuckets` salts. Produces exactly the rows of the plain
    * join, but spreads each hot key over `saltBuckets` shuffle
    * partitions. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int, saltSource: Seq[String]): DataFrame = {
    val b = big.withColumn("__salt",
      pmod(hash(saltSource.map(col): _*), lit(saltBuckets)))
    val sm = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    b.join(sm, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted) aggregation: partial aggregate on (key, salt),
    * then final aggregate on key. Spark's partial/final HashAggregate
    * already does this for algebraic aggregates; this form is for
    * explicitly forcing an extra fan-out stage on a known-hot key. */
  def saltedCount(df: DataFrame, key: String, saltBuckets: Int,
                  saltSource: Seq[String]): DataFrame = {
    df.withColumn("__salt", pmod(hash(saltSource.map(col): _*), lit(saltBuckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("cnt"))
  }
}
