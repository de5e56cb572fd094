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
  * quadratic blow-up); no broadcast requirement; skew bounded by key
  * cardinality. Right rows sort before left rows at equal ts, so
  * `right.ts == left.ts` matches (inclusive as-of).
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
}
