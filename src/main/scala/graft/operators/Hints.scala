package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.broadcast

/** Size-gated join hints (r16 VERDICT task 1).
  *
  * `broadcast(df)` is an UNCONDITIONAL hint: Spark honors it regardless
  * of `spark.sql.autoBroadcastJoinThreshold`, so a side that outgrows
  * executor memory fails instead of degrading to a shuffled join. Every
  * operator whose broadcast side scales with a DATA-derived count
  * (cells × cap representative tables, rank vectors) must gate the hint
  * on an estimated size against the session's own threshold — the
  * convention pagerank established (Graph.scala) — so the same code
  * broadcasts at fixture scale and degrades to a shuffled equi-join at
  * paper scale (SemDeDup's 50k-cluster regime puts the representative
  * side at ~6.8 GB). Both branches are result-identical: broadcast vs
  * shuffled execution of the SAME equi-join; NearDupSpec exercises the
  * fallback under a forced-low threshold and asserts hash-equal output.
  */
object Hints {

  /** The session's autoBroadcastJoinThreshold in bytes (-1 = broadcast
    * disabled). Accepts both the plain-long SQLConf default form and
    * the "10MB"-style suffixed form. */
  def broadcastThresholdBytes(s: SparkSession): Long = {
    val t = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try t.toLong
    catch {
      case _: NumberFormatException =>
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(t)
    }
  }

  /** `broadcast(df)` iff `estBytes` fits the session threshold, else
    * `df` unchanged — the planner then picks the shuffled strategy for
    * whatever join consumes it. Estimates should be UPPER bounds: an
    * over-estimate degrades early (slower, safe); an under-estimate
    * OOMs (the failure this gate exists to prevent). */
  def broadcastIfEstimated(df: DataFrame, estBytes: Long): DataFrame = {
    val t = broadcastThresholdBytes(df.sparkSession)
    if (t > 0 && estBytes <= t) broadcast(df) else df
  }
}
