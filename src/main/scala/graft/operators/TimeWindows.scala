package graft.operators

import graft.Q
import graft.sources.Tables
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

/** Batch forms of the G22 time-window operators, DuckDB-oracled — the
  * SAME column expressions StreamingOps runs incrementally (SURVEY.md
  * §2b G22: "batch window() variant oracled via date_trunc-bucket
  * SQL"). Spark's window() buckets are epoch-aligned in session-UTC;
  * the oracles rebuild the identical buckets with integer epoch
  * arithmetic, so boundary rows land identically in both engines.
  */
object TimeWindows {

  def all: Seq[Q] = Seq(

    // G22a: tumbling 1h × event_type (shares tumblingCounts's agg).
    Q("time_window_tumbling",
      """SELECT date_trunc('hour', ts) AS window_start,
        |  date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
        |  event_type,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2, 3
        |ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
      StreamingOps.tumblingCounts(Tables.events(s, d))
        .orderBy("window_start", "event_type")
    },

    // G22b: sliding 1h window every 30m — each event contributes to the
    // two windows [b-30m, b+30m) and [b, b+1h) where b = its 30m bucket.
    // Exact distinct users here (the streaming form uses HLL for
    // unbounded state; the batch oracle checks the exact variant).
    Q("time_window_sliding",
      """WITH b AS (
        |  SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800
        |           - off.o) AS TIMESTAMP) AS window_start,
        |    user_id
        |  FROM events, (SELECT unnest([0, 1800]) AS o) off)
        |SELECT window_start,
        |  window_start + INTERVAL 1 HOUR AS window_end,
        |  count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users
        |FROM b GROUP BY window_start
        |ORDER BY window_start""".stripMargin) { (s, d) =>
      // Arithmetic window-start keys instead of window()'s struct<start,
      // end> group key: same buckets (epoch-aligned, verified by the
      // oracle), but the shuffle/agg key is a flat 8-byte timestamp —
      // measurably cheaper under an exact count-distinct that shuffles
      // twice. StreamingOps.slidingCounts keeps the window() form (state
      // keys must be window structs for watermark eviction).
      val bucket = timestamp_seconds(expr("unix_micros(ts) div 1800000000") * 1800)
      Tables.events(s, d)
        .select(explode(array(bucket, bucket - expr("INTERVAL 30 MINUTES"))).as("window_start"),
          col("user_id"))
        .groupBy("window_start")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .select(col("window_start"),
          (col("window_start") + expr("INTERVAL 1 HOUR")).as("window_end"),
          col("n_events"), col("n_users"))
        .orderBy("window_start")
    },

    // G22++: the stream-static enrichment's batch form (the SAME
    // expressions StreamingOps.enrichEvents runs per micro-batch with
    // the dimension side broadcast; stream ≡ batch in StreamingSpec).
    Q("stream_static_enrich",
      """SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value,
        |  n.n_name AS nation
        |FROM events e
        |LEFT JOIN customer c ON e.user_id = c.c_custkey
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      StreamingOps.enrichEvents(Tables.events(s, d),
        Tables.customer(s, d), Tables.nation(s, d))
        .orderBy("event_id")
    },

    // G22+: the stream-stream interval join's batch form (the SAME
    // expressions StreamingOps.purchaseClickJoin runs incrementally with
    // two-sided watermark state eviction).
    Q("stream_join_batch_form",
      """SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
        |  c.event_id AS click_id, c.ts AS click_ts
        |FROM events p
        |JOIN events c ON c.user_id = p.user_id
        |  AND p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        |ORDER BY purchase_id, click_id""".stripMargin) { (s, d) =>
      StreamingOps.purchaseClickJoin(Tables.events(s, d))
        .orderBy("purchase_id", "click_id")
    },

    // G30+: the LEFT OUTER interval join's batch form — click-less
    // purchases survive with NULL click columns (in the stream they
    // emit once both watermarks pass the join window; see
    // StreamingOps.purchaseClickLeftJoin + StreamingSpec). NULL
    // ordering is pinned explicitly (engines default differently).
    Q("stream_left_join_batch_form",
      """SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
        |  c.event_id AS click_id, c.ts AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        |  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        |ORDER BY purchase_id, click_id NULLS FIRST""".stripMargin) { (s, d) =>
      StreamingOps.purchaseClickLeftJoin(Tables.events(s, d))
        .orderBy(col("purchase_id"), col("click_id").asc_nulls_first)
    },

    // G22c: session windows (30m gap) per user. Oracle is the classic
    // gaps-and-islands rewrite: a session break is a gap >= 30m (Spark
    // merges an event only when it lands STRICTLY inside [start,
    // prev+30m)); session_end = last event + gap.
    Q("time_window_session",
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
        |           OR lag(ts) OVER w IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM flagged)
        |SELECT min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  user_id, count(*) AS n_events
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      StreamingOps.sessionCounts(Tables.events(s, d))
        .orderBy("user_id", "session_start")
    },

    // G23++: batch form of the flatMapGroupsWithState gap sessionizer.
    // In batch execution timeouts never fire, so EXACTLY the gap-closed
    // sessions (every session except each user's event-time-last) are
    // emitted — a deterministic, SQL-expressible subset: the oracle is
    // the gaps-and-islands rewrite minus each user's max session id.
    // Epoch-micros bounds keep the compare integer-exact across engines.
    Q("sessions_stateful_closed",
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |b AS (
        |  SELECT user_id, ts_us,
        |    CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
        |           >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s AS (
        |  SELECT user_id, ts_us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM b),
        |g AS (
        |  SELECT user_id, sid, min(ts_us) AS start_us,
        |    max(ts_us) + 1800000000 AS end_us, count(*) AS n_events
        |  FROM s GROUP BY user_id, sid),
        |f AS (SELECT g.*, max(sid) OVER (PARTITION BY user_id) AS msid FROM g)
        |SELECT user_id, start_us, end_us, n_events FROM f
        |WHERE sid < msid
        |ORDER BY user_id, start_us""".stripMargin) { (s, d) =>
      import s.implicits._
      StreamingOps.sessionizeStateful(
        Tables.events(s, d).select(col("user_id"), col("ts"))
          .as[(Long, java.sql.Timestamp)],
        gapUs = 30L * 60 * 1000000)
        .orderBy("user_id", "start_us").toDF()
    },

    // X33: batch form of the transformWithState activity profile (one
    // batch over empty state ⇒ the final snapshot per user, which IS the
    // plain groupBy aggregate — fully oracled; multi-batch incremental
    // equivalence is asserted in StreamingSpec under RocksDB).
    Q("user_activity_tws",
      """WITH tc AS (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY user_id, event_type),
        |per AS (
        |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
        |    CAST(count(*) AS BIGINT) AS n_types
        |  FROM tc GROUP BY user_id),
        |top AS (
        |  SELECT user_id, event_type AS top_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY c DESC, event_type) AS rn
        |  FROM tc)
        |SELECT p.user_id, n_events, n_types, top_type
        |FROM per p JOIN top t ON p.user_id = t.user_id AND t.rn = 1
        |ORDER BY p.user_id""".stripMargin) { (s, d) =>
      import s.implicits._
      // batch TWS still runs through the state store; make sure the
      // driver coordinator endpoint exists in this batch-only session
      org.apache.spark.sql.graft.StateStoreBootstrap.ensureCoordinator(s)
      StreamingOps.userActivity(
        Tables.events(s, d).select(col("user_id"), col("event_type"))
          .as[(Long, String)])
        .orderBy("user_id").toDF()
    },

    // X19 (oracled since r11, VERDICT r10 task 6): batch form of the
    // mapGroupsWithState per-user profile. The accumulator sums doubles
    // in arrival order, which no SQL engine reproduces bit-for-bit —
    // but the fixture's `value` column is exactly 2-decimal (verified:
    // 0 rows where value <> round(value,2) at sf0.01), so the true
    // per-user total is a multiple of 0.01 and sits 5e-3 away from any
    // 2dp rounding boundary, while the float-sum error over ≤ a few
    // hundred addends is ~1e-11 — eight orders of magnitude of margin.
    // round(total,2) therefore lands both engines on the identical
    // double regardless of summation order, converting the whole
    // profile (counts, first/last epoch-micros, total) to a hash-exact
    // oracle. Incremental multi-batch ≡ batch equivalence stays pinned
    // in StreamingSpec.
    Q("user_profiles_stateful",
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(round(sum(value), 2) AS DOUBLE) AS total_value,
        |  min(epoch_us(ts)) AS first_ts_us, max(epoch_us(ts)) AS last_ts_us
        |FROM events GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      import s.implicits._
      StreamingOps.userProfiles(
        Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
          .as[(Long, Long, Double)])
        .select(col("user_id"), col("n_events"),
          round(col("total_value"), 2).as("total_value"),
          col("first_ts_us"), col("last_ts_us"))
        .orderBy("user_id")
    }
  )
}
