package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact order statistics + robust outlier detection (G25 extension):
  * per-group exact percentiles (sort-based, linear interpolation — the
  * `percentile_cont` semantics) and median/MAD outlier flagging, the
  * robust filter a data-curation pipeline uses where mean/stddev break
  * under heavy tails.
  *
  * Scale posture: Spark's exact `percentile` aggregates a per-group
  * value-count map (partial aggregation applies; memory bounds by
  * DISTINCT values per group, fine for bounded-domain measures like
  * quantities/prices — for unbounded high-cardinality doubles at 100 TB
  * you'd switch to `approx_percentile`, registered separately as
  * `approx_quantiles`). The MAD pass is two grouped aggregations joined
  * on the (low-cardinality) group key — the group-median table is
  * broadcast back, so the big fact side never reshuffles twice.
  */
object RobustStats {

  /** Per-returnflag exact quartiles of quantity and price. */
  def quartiles(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("q1_qty"),
        expr("percentile(l_quantity, 0.5)").as("med_qty"),
        expr("percentile(l_quantity, 0.75)").as("q3_qty"),
        expr("percentile(l_extendedprice, 0.5)").as("med_price"))
      .select(col("l_returnflag"),
        round(col("q1_qty"), 9).as("q1_qty"),
        round(col("med_qty"), 9).as("med_qty"),
        round(col("q3_qty"), 9).as("q3_qty"),
        round(col("med_price"), 9).as("med_price"))
      .orderBy("l_returnflag")

  /** Median/MAD outlier counts per event type: |v − med| > 3·MAD. */
  def madOutliers(events: DataFrame): DataFrame = {
    val med = events.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val withMed = events.select("event_type", "value")
      .join(broadcast(med), "event_type")
    val mad = withMed.groupBy("event_type")
      .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
    withMed.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(
        first(col("med")).as("m"),
        first(col("mad")).as("d"),
        sum(when(abs(col("value") - col("med")) > lit(3.0) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n"))
      .select(col("event_type"),
        round(col("m"), 9).as("med"),
        round(col("d"), 9).as("mad"),
        col("n_outliers"), col("n"))
      .orderBy("event_type")
  }

  def all: Seq[Q] = Seq(

    Q("percentile_exact",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 9) AS q1_qty,
        |  round(quantile_cont(l_quantity, 0.5), 9) AS med_qty,
        |  round(quantile_cont(l_quantity, 0.75), 9) AS q3_qty,
        |  round(quantile_cont(l_extendedprice, 0.5), 9) AS med_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      quartiles(Tables.spread(s, d, "lineitem"))
    },

    Q("outlier_mad",
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |wm AS (
        |  SELECT e.event_type, e.value, med.med
        |  FROM events e JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
        |  FROM wm GROUP BY event_type)
        |SELECT wm.event_type,
        |  round(any_value(wm.med), 9) AS med,
        |  round(any_value(mad.mad), 9) AS mad,
        |  CAST(sum(CASE WHEN abs(wm.value - wm.med) > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  count(*) AS n
        |FROM wm JOIN mad USING (event_type)
        |GROUP BY wm.event_type ORDER BY wm.event_type""".stripMargin) { (s, d) =>
      madOutliers(Tables.events(s, d))
    },

    // Deterministic mode: most frequent priority per order status, with
    // the (max count, then MIN value) convention stated explicitly —
    // builtin mode() leaves ties engine-defined, so both sides implement
    // the convention rather than the builtin. Aggregation-shaped (min of
    // a (-cnt, value) struct), no low-cardinality window.
    Q("mode_exact",
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
        |FROM c
        |QUALIFY row_number() OVER (PARTITION BY o_orderstatus
        |                           ORDER BY cnt DESC, o_orderpriority) = 1
        |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("o_orderstatus")
        .agg(min(struct((-col("cnt")).as("neg"), col("o_orderpriority").as("p")))
          .as("m"))
        .select(col("o_orderstatus"),
          col("m.p").as("mode_priority"),
          (-col("m.neg")).as("cnt"))
        .orderBy("o_orderstatus")
    },

    // X76: shuffle-key skew diagnostic — the distribution of rows per
    // key for the keys a pipeline actually shuffles on (join keys,
    // groupBy keys), as the operational report every 100 TB job runs
    // when a straggler appears: key count, rows/key percentiles, the
    // hottest key's share, and the max/avg skew ratio that decides
    // whether AQE skew-split or salting (Skew.saltedJoin) is needed.
    // One hash agg to |keys| rows per audited key, then a single exact
    // percentile aggregation over that (small) count table.
    Q("skew_diagnostic",
      """WITH a AS (
        |  SELECT 'lineitem.l_partkey' AS key_col, count(*) AS c
        |  FROM lineitem GROUP BY l_partkey
        |  UNION ALL
        |  SELECT 'events.user_id', count(*) FROM events GROUP BY user_id)
        |SELECT key_col,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(c) AS BIGINT) AS total_rows,
        |  round(CAST(SUM(c) AS DOUBLE) / count(*), 9) AS avg_rows,
        |  round(quantile_cont(c, 0.5), 9) AS p50,
        |  round(quantile_cont(c, 0.9), 9) AS p90,
        |  round(quantile_cont(c, 0.99), 9) AS p99,
        |  CAST(max(c) AS BIGINT) AS max_rows,
        |  round(CAST(max(c) AS DOUBLE) / (CAST(SUM(c) AS DOUBLE) / count(*)), 9) AS skew_ratio
        |FROM a GROUP BY key_col ORDER BY key_col""".stripMargin) { (s, d) =>
      def keyCounts(df: org.apache.spark.sql.DataFrame, key: String, lbl: String) =
        df.groupBy(col(key)).agg(count(lit(1)).as("c"))
          .select(lit(lbl).as("key_col"), col("c"))
      keyCounts(Tables.lineitem(s, d), "l_partkey", "lineitem.l_partkey")
        .union(keyCounts(Tables.events(s, d), "user_id", "events.user_id"))
        .groupBy("key_col")
        .agg(
          count(lit(1)).as("n_keys"),
          sum(col("c")).as("total_rows"),
          round(sum(col("c")).cast("double") / count(lit(1)), 9).as("avg_rows"),
          round(expr("percentile(c, 0.5)"), 9).as("p50"),
          round(expr("percentile(c, 0.9)"), 9).as("p90"),
          round(expr("percentile(c, 0.99)"), 9).as("p99"),
          max(col("c")).as("max_rows"),
          round(max(col("c")).cast("double")
            / (sum(col("c")).cast("double") / count(lit(1))), 9).as("skew_ratio"))
        .orderBy("key_col")
    }
  )
}
