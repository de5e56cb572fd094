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
    },

    // X57: last-touch attribution — every purchase credited to the SAME
    // user's most recent click at-or-before it (unbounded lookback;
    // purchases with no prior click keep NULL attribution — unattributed
    // conversions are a metric, not a dropped row). Winner by (ts DESC,
    // event_id DESC), deterministic under same-timestamp clicks.
    //
    // Shape: per-user time-bounded theta join (both sides pre-filtered
    // to their event type BEFORE the join — the shuffle carries
    // purchases + clicks, not the event firehose) + a mergeable
    // max-of-struct argmax per purchase, no window over the join
    // output. Per-task work is bounded by per-user purchase×click
    // counts; at a scale where user histories are huge, the
    // time-bucketed as-of form (X16, AsOfJoin) is the drop-in.
    Q("attribution_last_touch",
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click')
        |SELECT p.purchase_id, p.user_id, p.purchase_ts,
        |  c.click_id, c.click_ts
        |FROM p LEFT JOIN c
        |  ON c.user_id = p.user_id AND c.click_ts <= p.purchase_ts
        |QUALIFY row_number() OVER (
        |  PARTITION BY p.purchase_id
        |  ORDER BY c.click_ts DESC, c.click_id DESC) = 1
        |ORDER BY p.purchase_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("click_ts"))
      p.join(c, col("user_id") === col("c_user") &&
          col("click_ts") <= col("purchase_ts"), "left")
        .groupBy("purchase_id", "user_id", "purchase_ts")
        .agg(max(struct(col("click_ts"), col("click_id"))).as("m"))
        .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
          col("m.click_id").as("click_id"), col("m.click_ts").as("click_ts"))
        .orderBy("purchase_id")
    }
  )
}
