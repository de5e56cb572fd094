package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence funnel analysis (X24): for each user, the earliest
  * view → click → signup → purchase chain where every stage happens
  * STRICTLY AFTER the previous stage's earliest occurrence — the classic
  * product-analytics funnel, expressed as a chain of keyed min-aggregates
  * (stage k's candidate events are filtered against stage k−1's time
  * before the min), not a per-user event-sort.
  *
  * Scale posture: every stage is filter → shuffle on user_id → min, and
  * all four stages share the same partitioning key, so Catalyst reuses
  * the exchange layout; no window over whole user histories, no
  * `collect_list` of events (a power user with 10^7 events costs the
  * same as anyone else).
  */
object Funnel {

  private def stageAfter(events: DataFrame, prev: DataFrame, typ: String,
      prevCol: String, outCol: String): DataFrame =
    events.filter(col("event_type") === typ)
      .join(prev.select("user_id", prevCol), "user_id")
      .filter(col("ts") > col(prevCol))
      .groupBy("user_id").agg(min(col("ts")).as(outCol))

  def funnel(events: DataFrame): DataFrame = {
    val ev = events.select("user_id", "event_type", "ts")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val c = stageAfter(ev, v, "click", "t_view", "t_click")
    val s = stageAfter(ev, c, "signup", "t_click", "t_signup")
    val p = stageAfter(ev, s, "purchase", "t_signup", "t_purchase")
    v.join(c, Seq("user_id"), "left")
      .join(s, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .orderBy("user_id")
  }

  def all: Seq[Q] = Seq(
    Q("funnel_stages",
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id),
        |s AS (
        |  SELECT e.user_id, min(e.ts) AS t_signup
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'signup' AND e.ts > c.t_click GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM events e JOIN s USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s.t_signup GROUP BY e.user_id)
        |SELECT v.user_id, v.t_view, c.t_click, s.t_signup, p.t_purchase
        |FROM v LEFT JOIN c USING (user_id)
        |  LEFT JOIN s USING (user_id)
        |  LEFT JOIN p USING (user_id)
        |ORDER BY v.user_id""".stripMargin) { (s, d) =>
      funnel(Tables.events(s, d))
    }
  )
}
