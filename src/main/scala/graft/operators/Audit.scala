package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit (X42) — the Deequ-style
  * check suite a warehouse runs before promoting a snapshot: referential
  * integrity (orphan foreign keys), key uniqueness, null-rate and value-
  * domain checks, each reported as one (check, violations, total, pass)
  * row. The suite is ONE DataFrame (a union of independent aggregates),
  * so a scheduler submits it as a single job and Spark shares nothing it
  * shouldn't — each branch is its own pruned scan.
  *
  * Scale posture per check shape:
  *  - orphan FK = left-anti join counted; the dimension side (customer /
  *    orders keys) is a single pruned column, broadcast under threshold,
  *    SMJ beyond — never a collected driver set.
  *  - uniqueness = count(*) vs count(DISTINCT key): one aggregate with a
  *    partial-agg distinct expansion, no self-join.
  *  - null-rate / domain = scan-local conditional counts folded into one
  *    aggregation pass per table (two checks on `events` below share one
  *    scan rather than rescanning per check).
  */
object Audit {

  /** The audit suite over a scale directory. Public so callers can embed
    * the same suite over their own snapshots. */
  def constraintAudit(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val events = Tables.events(s, d)

    def shape(name: String, violations: org.apache.spark.sql.Column,
              total: org.apache.spark.sql.Column) =
      Seq(lit(name).as("check"), violations.cast("long").as("violations"),
        total.cast("long").as("total"))

    val orphanOrders = orders.select(col("o_custkey"))
      .join(Tables.customer(s, d).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
      .select(shape("orders_orphan_custkey", col("v"), lit(null)): _*)

    val orphanLines = Tables.lineitem(s, d).select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
      .select(shape("lineitem_orphan_orderkey", col("v"), lit(null)): _*)

    val custUnique = Tables.customer(s, d)
      .agg((count(lit(1)) - countDistinct(col("c_custkey"))).as("v"),
        count(lit(1)).as("n"))
      .select(shape("customer_dup_custkey", col("v"), col("n")): _*)

    // both events checks in ONE aggregation pass over one scan
    val eventsChecks = events
      .agg(
        count(when(col("user_id").isNull, 1)).as("v_null"),
        count(when(col("value") < 0, 1)).as("v_neg"),
        count(lit(1)).as("n"))
      .select(explode(array(
        struct(lit("events_null_user_id").as("check"),
          col("v_null").cast("long").as("violations"), col("n").cast("long").as("total")),
        struct(lit("events_negative_value").as("check"),
          col("v_neg").cast("long").as("violations"), col("n").cast("long").as("total"))
      )).as("r"))
      .select("r.check", "r.violations", "r.total")

    val priceDomain = orders
      .agg(count(when(col("o_totalprice") <= 0, 1)).as("v"), count(lit(1)).as("n"))
      .select(shape("orders_nonpositive_total", col("v"), col("n")): _*)

    orphanOrders
      .unionByName(orphanLines)
      .unionByName(custUnique)
      .unionByName(eventsChecks)
      .unionByName(priceDomain)
      .withColumn("pass", col("violations") === 0L)
      .orderBy("check")
  }

  def all: Seq[Q] = Seq(

    Q("constraint_audit",
      """WITH checks AS (
        |  SELECT 'orders_orphan_custkey' AS "check",
        |    (SELECT count(*) FROM orders o WHERE NOT EXISTS (
        |       SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS violations,
        |    CAST(NULL AS BIGINT) AS total
        |  UNION ALL
        |  SELECT 'lineitem_orphan_orderkey',
        |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS (
        |       SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
        |    NULL
        |  UNION ALL
        |  SELECT 'customer_dup_custkey',
        |    (SELECT count(*) - count(DISTINCT c_custkey) FROM customer),
        |    (SELECT count(*) FROM customer)
        |  UNION ALL
        |  SELECT 'events_null_user_id',
        |    (SELECT count(*) FILTER (WHERE user_id IS NULL) FROM events),
        |    (SELECT count(*) FROM events)
        |  UNION ALL
        |  SELECT 'events_negative_value',
        |    (SELECT count(*) FILTER (WHERE value < 0) FROM events),
        |    (SELECT count(*) FROM events)
        |  UNION ALL
        |  SELECT 'orders_nonpositive_total',
        |    (SELECT count(*) FILTER (WHERE o_totalprice <= 0) FROM orders),
        |    (SELECT count(*) FROM orders))
        |SELECT "check", violations, total, violations = 0 AS pass
        |FROM checks ORDER BY "check"""".stripMargin)(constraintAudit),

    // X72: snapshot diff / change-feed generation — the INVERSE of
    // X36's CDC apply: given two keyed snapshots, emit what changed
    // (added / removed / changed / same, with the changed-column list),
    // summarized per (status, changed_cols). The data-diff every
    // pipeline debugging session and incremental-publish step needs.
    // The "new" snapshot is derived deterministically from orders so
    // both engines diff identical inputs: keys ≡ 0 (mod 13) deleted,
    // prices of keys ≡ 0 (mod 7) shifted by +10.0 (an exact double add
    // — no rounding, so equality compares bit-identically), every 9th
    // status flipped.
    //
    // 100 TB posture: ONE full-outer join keyed on the snapshot key
    // (both sides shuffle once, partial-agg counts after); column
    // comparisons are scan-local; null-safe equality (<=>) keeps NULL
    // cells from faking changes.
    Q("snapshot_diff",
      """WITH old AS (
        |  SELECT o_orderkey AS k, o_totalprice AS price, o_orderstatus AS st
        |  FROM orders),
        |new_ AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
        |         ELSE o_totalprice END AS price,
        |    CASE WHEN o_orderkey % 9 = 0 THEN 'X' ELSE o_orderstatus END AS st
        |  FROM orders WHERE o_orderkey % 13 <> 0
        |  UNION ALL
        |  SELECT -o_orderkey - 1, o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 101 = 0),
        |d AS (
        |  SELECT
        |    CASE WHEN o.k IS NULL THEN 'added'
        |         WHEN n.k IS NULL THEN 'removed'
        |         WHEN o.price IS DISTINCT FROM n.price
        |           OR o.st IS DISTINCT FROM n.st THEN 'changed'
        |         ELSE 'same' END AS status,
        |    concat_ws(',',
        |      CASE WHEN o.k IS NOT NULL AND n.k IS NOT NULL
        |             AND o.price IS DISTINCT FROM n.price THEN 'price' END,
        |      CASE WHEN o.k IS NOT NULL AND n.k IS NOT NULL
        |             AND o.st IS DISTINCT FROM n.st THEN 'st' END) AS changed_cols
        |  FROM old o FULL OUTER JOIN new_ n ON o.k = n.k)
        |SELECT status, changed_cols, count(*) AS n
        |FROM d GROUP BY status, changed_cols
        |ORDER BY status, changed_cols""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
      val old = orders.select(col("o_orderkey").as("k"),
        col("o_totalprice").as("price"), col("o_orderstatus").as("st"))
      val neu = orders.filter(pmod(col("o_orderkey"), lit(13)) =!= 0)
        .select(col("o_orderkey").as("nk"),
          when(pmod(col("o_orderkey"), lit(7)) === 0, col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice")).as("nprice"),
          when(pmod(col("o_orderkey"), lit(9)) === 0, lit("X"))
            .otherwise(col("o_orderstatus")).as("nst"))
        // -k - 1 keeps synthetic keys strictly negative (key 0 exists —
        // a bare negation would collide it with the old snapshot)
        .union(orders.filter(pmod(col("o_orderkey"), lit(101)) === 0)
          .select((-col("o_orderkey") - 1).as("nk"),
            col("o_totalprice").as("nprice"), col("o_orderstatus").as("nst")))
      val joined = old.join(neu, col("k") === col("nk"), "full_outer")
      val priceChanged = !(col("price") <=> col("nprice"))
      val stChanged = !(col("st") <=> col("nst"))
      val both = col("k").isNotNull && col("nk").isNotNull
      joined.select(
        when(col("k").isNull, "added")
          .when(col("nk").isNull, "removed")
          .when(priceChanged || stChanged, "changed")
          .otherwise("same").as("status"),
        concat_ws(",",
          when(both && priceChanged, "price"),
          when(both && stChanged, "st")).as("changed_cols"))
        .groupBy("status", "changed_cols")
        .agg(count(lit(1)).as("n"))
        .orderBy("status", "changed_cols")
    }
  )
}
