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
    }
  )
}
