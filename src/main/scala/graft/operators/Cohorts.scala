package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Cohort / longitudinal event analytics: retention matrices and
  * per-entity exponentially-weighted running statistics.
  *
  * Determinism: cohort bucketing is calendar arithmetic (Monday-start
  * `date_trunc('week')` in both engines); the EWMA is a sequential fold
  * in (ts, event_id) order — multiply-add only, so both engines execute
  * the IDENTICAL IEEE operation sequence (same trick as token_entropy's
  * sequential-fold oracle parity).
  *
  * 100 TB posture: retention is two hash aggregations and one keyed
  * join, all on user_id or (cohort, week) — no windows, no collect. The
  * EWMA folds inside ONE per-user aggregation (collect_list bounded by
  * per-user event counts — event streams per entity are small; a
  * pathological entity would hit the same bound any per-key sequential
  * statistic does, and gets capped upstream by sampling, not here).
  */
object Cohorts {

  def all: Seq[Q] = Seq(

    // Weekly retention cohorts: users bucketed by first-seen week, then
    // distinct (cohort, activity-week) user counts — the triangle
    // matrix in long form.
    Q("retention_cohorts",
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
        |  FROM events),
        |cohort AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, wk FROM e)
        |SELECT c.cohort_week, a.wk AS activity_week,
        |  count(DISTINCT a.user_id) AS n_users
        |FROM act a JOIN cohort c ON a.user_id = c.user_id
        |GROUP BY c.cohort_week, a.wk
        |ORDER BY cohort_week, activity_week""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val cohort = e.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
      val act = e.distinct()
      act.join(cohort, "user_id")
        .groupBy(col("cohort_week"), col("wk").as("activity_week"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "activity_week")
    },

    // Per-user EWMA of event values (α = 0.25), seeded with the user's
    // first value: ewma_i = 0.25·x_i + 0.75·ewma_{i-1} folded in
    // (ts, event_id) order. Spark folds via the `aggregate` HOF over the
    // sorted struct array; DuckDB's list_reduce seeds from the first
    // element with the same left fold — identical operation order, so
    // the doubles match bit-for-bit (rounded once for display).
    Q("ewma_user_value",
      """WITH ord AS (
        |  SELECT user_id,
        |    list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS xs
        |  FROM events GROUP BY user_id)
        |SELECT user_id, len(xs) AS n_events,
        |  round(list_reduce(xs,
        |    (acc, x) -> acc * CAST(0.75 AS DOUBLE) + x * CAST(0.25 AS DOUBLE)), 9) AS ewma
        |FROM ord ORDER BY user_id""".stripMargin) { (s, d) =>
      val sorted = array_sort(collect_list(struct(col("ts"), col("event_id"),
        col("value").cast("double").as("v"))))
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(transform(sorted, e => e.getField("v")).as("xs"))
        .select(col("user_id"), size(col("xs")).cast("long").as("n_events"),
          round(aggregate(
            slice(col("xs"), lit(2), size(col("xs")) - 1),
            element_at(col("xs"), 1),
            (acc, x) => acc * lit(0.75) + x * lit(0.25)), 9).as("ewma"))
        .orderBy("user_id")
    }
  )
}
