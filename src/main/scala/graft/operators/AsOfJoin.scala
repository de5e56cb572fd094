package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time lookup): for every left row, the most recent
  * right row with `right.ts <= left.ts` within the same key group.
  *
  * The reference engine has no joins at all (SURVEY.md §2a — single-input
  * job); this is part of the generalized surface (G13). Spark has no
  * built-in as-of join, so we compose one from primitives — preference
  * (a) of the custom-operator ladder — using the union + last-non-null
  * window trick:
  *
  *   1. tag both inputs and unionByName them,
  *   2. one window over (key, ts, side) per partition-of-key,
  *   3. `last(right_ts, ignoreNulls)` over rows UNBOUNDED PRECEDING →
  *      CURRENT ROW carries the latest right timestamp forward,
  *   4. keep only left rows.
  *
  * Scale posture: ONE shuffle on the key (vs a naive range join's
  * quadratic blow-up); no broadcast requirement. Right rows sort before
  * left rows at equal ts, so `right.ts == left.ts` matches (inclusive
  * as-of). CAVEAT: each key is one window partition, so a
  * low-cardinality key (like events.user_id, cardinality ~tens) means
  * a handful of giant tasks at 100 TB — use [[lastTimestampBucketed]]
  * there, which sub-partitions every key by time bucket and carries the
  * per-bucket last value in, bounding every task by bucket span.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     build side (rows looked up as-of)
    * @param key       equi-join key column name (present in both)
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @return left rows + `asof_ts` column (null when no prior right row)
    */
  def lastTimestamp(left: DataFrame, right: DataFrame, key: String,
                    leftTs: String, rightTs: String): DataFrame = {
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rts", lit(null).cast("timestamp"))
    val r = right
      .select(col(key), col(rightTs).as("__ts"))
      .withColumn("__side", lit(0))
      .withColumn("__rts", col("__ts"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"), col("__rts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof_ts", last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__rts")
  }

  /** Scale form of [[lastTimestamp]]: window partitions are (key, time
    * bucket) instead of bare key, so partition size is bounded by bucket
    * span × arrival rate no matter how few keys exist. The cross-bucket
    * dependency (a bucket's answer can come from an arbitrarily earlier
    * bucket) is restored by a carry-in pass:
    *
    *   1. per (key, bucket): latest right ts — plain aggregation;
    *   2. per key, over the (small) bucket spine: running max over
    *      STRICTLY EARLIER buckets = the carry-in — a window over
    *      #buckets rows per key, not #events;
    *   3. inject each carry-in as a synthetic right row (its real,
    *      earlier ts sorts it before everything in the bucket) and run
    *      the same last-non-null window per (key, bucket).
    *
    * Identical results to [[lastTimestamp]] (AsOfJoinSpec asserts it;
    * join_asof_bucketed shares join_asof's DuckDB oracle). */
  def lastTimestampBucketed(left: DataFrame, right: DataFrame, key: String,
                            leftTs: String, rightTs: String,
                            bucketSeconds: Long = 86400L): DataFrame = {
    def bucketOf(ts: Column): Column =
      floor(unix_micros(ts) / lit(bucketSeconds * 1000000L)).cast("long")
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rts", lit(null).cast("timestamp"))
      .withColumn("__b", bucketOf(col("__ts")))
    val r = right
      .select(col(key), col(rightTs).as("__ts"))
      .withColumn("__side", lit(0))
      .withColumn("__rts", col("__ts"))
      .withColumn("__b", bucketOf(col("__ts")))
    val lastPerBucket = r.groupBy(col(key), col("__b")).agg(max("__rts").as("__last"))
    val spine = l.select(col(key), col("__b"))
      .union(r.select(col(key), col("__b"))).distinct()
    val carryW = Window.partitionBy(key).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = spine.join(lastPerBucket, Seq(key, "__b"), "left")
      .withColumn("__carry", max(col("__last")).over(carryW))
      .filter(col("__carry").isNotNull)
      .select(col(key), col("__b"), col("__carry").as("__rts"))
      .withColumn("__ts", col("__rts"))
      .withColumn("__side", lit(0))
    val unioned = l
      .unionByName(r, allowMissingColumns = true)
      .unionByName(carry, allowMissingColumns = true)
    val w = Window.partitionBy(col(key), col("__b"))
      .orderBy(col("__ts"), col("__side"), col("__rts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof_ts", last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__rts", "__b")
  }

  /** Generalized: carry arbitrary right-side payload columns as-of.
    * Payload values ride in a struct so one `last(ignoreNulls)` picks the
    * whole row atomically (ties broken by (ts, payload) struct order). */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val payloadStruct = struct((col(rightTs) +: payload.map(col)): _*)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right
      .select(col(key), col(rightTs).as("__ts"),
        payloadStruct.as("__p"))
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val withCols = payload.foldLeft(
      carried.withColumn("asof_ts", col(s"__asof.$rightTs"))) {
      case (df, c) => df.withColumn(s"asof_$c", col(s"__asof.$c"))
    }
    withCols.drop("__ts", "__side", "__p", "__asof")
  }

  /** Forward (look-ahead) as-of: for every left row, the EARLIEST right
    * row with `right.ts >= left.ts` within the same key group — the
    * mirror of [[lastTimestamp]], same one-shuffle union+window shape
    * with the frame and tie order reversed: right rows sort AFTER left
    * rows at equal ts (`__side` DESC) so an equal-timestamp right row
    * falls inside the CURRENT ROW → UNBOUNDED FOLLOWING frame
    * (inclusive forward match), and `first(ignoreNulls)` picks the
    * soonest one. The backfill shape: "next shipment after the order",
    * "first response after the ticket". */
  def firstTimestamp(left: DataFrame, right: DataFrame, key: String,
                     leftTs: String, rightTs: String): DataFrame = {
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rts", lit(null).cast("timestamp"))
    val r = right
      .select(col(key), col(rightTs).as("__ts"))
      .withColumn("__side", lit(0))
      .withColumn("__rts", col("__ts"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__side").desc, col("__rts"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn("next_ts", first(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__rts")
  }
}
