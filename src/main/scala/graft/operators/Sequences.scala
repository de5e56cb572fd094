package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence mining (X41): first-order Markov transition counts and
  * probabilities over each user's time-ordered event stream — the
  * "what follows what" table behind next-event prediction features,
  * funnel-drop diagnostics and session-boundary heuristics.
  *
  * Shape: one `lag` window per user stream (hash shuffle on user_id,
  * high cardinality, task size bound by per-user history) feeding one
  * hash aggregation on (prev, next) — cardinality |types|², tiny. The
  * per-prev probability denominator comes from a window SUM over the
  * aggregated |types|² table, not a second pass over events.
  *
  * Determinism: events can share a timestamp within a user, so the
  * stream order is (ts, event_id) — event_id is unique, making `lag`
  * reproducible across engines and partitionings (the same tiebreak
  * convention as `Windows.scala`).
  */
object Sequences {

  def all: Seq[Q] = Seq(

    // X41: transition matrix with per-source probabilities. First events
    // of each user (no predecessor) roll up under prev = '(start)' so
    // probabilities per source sum to 1 over a closed universe.
    Q("event_transitions",
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |t AS (
        |  SELECT coalesce(prev, '(start)') AS prev_type, event_type AS next_type,
        |    count(*) AS n
        |  FROM seq GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |  round(n / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6) AS p
        |FROM t ORDER BY prev_type, next_type""".stripMargin) { (s, d) =>
      val stream = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val t = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          lag(col("event_type"), 1).over(stream).as("prev"))
        .groupBy(coalesce(col("prev"), lit("(start)")).as("prev_type"),
          col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      t.select(col("prev_type"), col("next_type"), col("n"),
          round(col("n") / sum(col("n")).over(Window.partitionBy("prev_type"))
            .cast("double"), 6).as("p"))
        .orderBy("prev_type", "next_type")
    },

    // X55: top opening paths — each user's first 3 event types in
    // (ts, event_id) order joined into a path string, counted across
    // users, top 20. The onboarding-flow fingerprint behind "what do
    // new users actually do first".
    //
    // Shape: ONE per-user aggregation (sorted-struct collect + slice;
    // user_id is high-cardinality so the heavy agg spreads, and the
    // collect state is bounded by per-user history — the same per-key
    // bound every user-partitioned window in Windows.scala carries)
    // feeding a tiny path-count agg + heap top-k.
    Q("user_paths_topk",
      """WITH p AS (
        |  SELECT user_id,
        |    array_to_string(list(event_type ORDER BY ts, event_id)[1:3], ' > ') AS path
        |  FROM events GROUP BY user_id)
        |SELECT path, count(*) AS n_users
        |FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin) { (s, d) =>
      val sorted = array_sort(collect_list(struct(col("ts"), col("event_id"),
        col("event_type").as("t"))))
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(array_join(
          transform(slice(sorted, 1, 3), e => e.getField("t")), " > ").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path")).limit(20)
    },

    // X56: rolling engagement — per day, exact DAU and trailing-7-day
    // active users (WAU). Exact rolling DISTINCT does not decompose
    // into window sums; the scale shape is the CONTRIBUTION EXPLODE:
    // each distinct (day, user) pair contributes to its 7 trailing
    // report days (a constant 7× multiply of the deduped daily table,
    // NOT of raw events), then one hash agg per report day — no
    // window, no per-day re-scan. DAU rides the same agg via a
    // conditional distinct.
    Q("rolling_active_users",
      """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |-- report spine = EVERY calendar day in the corpus span: a dead
        |-- day must appear as a dau=0 row, not silently vanish from the
        |-- daily series
        |days AS (
        |  SELECT unnest(generate_series(min(day), max(day),
        |                                INTERVAL 1 DAY))::DATE AS d
        |  FROM du),
        |contrib AS (
        |  SELECT du.day AS od,
        |    unnest(generate_series(du.day, du.day + INTERVAL 6 DAY,
        |                           INTERVAL 1 DAY))::DATE AS d,
        |    user_id
        |  FROM du)
        |SELECT days.d AS day,
        |  count(DISTINCT CASE WHEN c.od = days.d THEN c.user_id END) AS dau,
        |  count(DISTINCT c.user_id) AS wau7
        |FROM days LEFT JOIN contrib c ON c.d = days.d
        |GROUP BY days.d ORDER BY day""".stripMargin) { (s, d) =>
      val du = Tables.events(s, d)
        .select(col("ts").cast("date").as("day"), col("user_id")).distinct()
      // full-span day spine (bounded by the corpus' calendar span, one
      // row per day) — also trims partial trailing windows past the end
      val days = du.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("d"))
      du.select(col("day").as("od"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("d"),
          col("user_id"))
        .join(days, Seq("d"), "right")
        .groupBy(col("d").as("day"))
        .agg(countDistinct(when(col("od") === col("d"), col("user_id"))).as("dau"),
          countDistinct(col("user_id")).as("wau7"))
        .orderBy("day")
    },

    // X73: the SKETCH-TABLE form of the rolling distinct — daily HLL
    // sketches built once, union-merged per trailing window. This is
    // how 100 TB pipelines actually serve rolling actives: X56's exact
    // contribution-explode shuffles |daily-actives|×7 user rows; here
    // the shuffle after the one daily aggregation carries |days|×7
    // KILOBYTE sketches, and any window width / ad-hoc date range is a
    // re-merge of the same persisted sketch table, no event rescan.
    // Estimates, so no SQL oracle — CmsSpec (the sketch-family suite)
    // bounds the relative error against the exact X56 query
    // (DataSketches HLL, lgK=12, ~1.6% typical). Dead days stay on the
    // spine with estimate 0.
    Q.noOracle("hll_rolling_users") { (s, d) =>
      val daily = Tables.events(s, d)
        .select(col("ts").cast("date").as("day"), col("user_id"))
        .groupBy("day")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val days = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("d"))
      daily.select(col("day").as("od"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("d"),
          col("sk"))
        .join(days, Seq("d"), "right")
        .groupBy(col("d").as("day"))
        .agg(
          coalesce(hll_sketch_estimate(
            hll_union_agg(when(col("od") === col("d"), col("sk")))), lit(0L)).as("dau_est"),
          coalesce(hll_sketch_estimate(hll_union_agg(col("sk"))), lit(0L)).as("wau7_est"))
        .orderBy("day")
    },

    // X73 (oracled, VERDICT r08 task 8): the sketch-vs-exact BOUND as a
    // driver-checked query — every day where the HLL estimate deviates
    // more than 5% (≈3σ at lgK=12) from the exact rolling distinct.
    // Expected result: ZERO rows, and that emptiness IS the oracle-able
    // claim (the estimates themselves are engine-specific, but "no day
    // violates the bound" is exact). The exact side is the same
    // contribution-explode pipeline the driver already hash-verifies as
    // rolling_active_users; a sketch regression (wrong lgK, broken
    // union, dropped day) surfaces as rows here → row-count mismatch.
    Q("hll_rolling_bound",
      """SELECT CAST(NULL AS DATE) AS day,
        |  CAST(NULL AS DOUBLE) AS dau_rel_err,
        |  CAST(NULL AS DOUBLE) AS wau7_rel_err
        |WHERE false""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("ts").cast("date").as("day"), col("user_id"))
      val du = ev.distinct()
      val days = du.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("d"))
      val exact = du.select(col("day").as("od"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("d"),
          col("user_id"))
        .join(days, Seq("d"), "right")
        .groupBy(col("d").as("day"))
        .agg(countDistinct(when(col("od") === col("d"), col("user_id"))).as("dau"),
          countDistinct(col("user_id")).as("wau7"))
      val daily = ev.groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
      val est = daily.select(col("day").as("od"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("d"),
          col("sk"))
        .join(days, Seq("d"), "right")
        .groupBy(col("d").as("day"))
        .agg(
          coalesce(hll_sketch_estimate(
            hll_union_agg(when(col("od") === col("d"), col("sk")))), lit(0L)).as("dau_est"),
          coalesce(hll_sketch_estimate(hll_union_agg(col("sk"))), lit(0L)).as("wau7_est"))
      exact.join(est, "day")
        .select(col("day"),
          (abs(col("dau_est") - col("dau")).cast("double") /
            greatest(col("dau"), lit(1L))).as("dau_rel_err"),
          (abs(col("wau7_est") - col("wau7")).cast("double") /
            greatest(col("wau7"), lit(1L))).as("wau7_rel_err"))
        .filter(col("dau_rel_err") > 0.05 || col("wau7_rel_err") > 0.05)
        .orderBy("day")
    }
  )
}
