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
        |FROM checks ORDER BY "check"""".stripMargin)(constraintAudit)
  )
}
