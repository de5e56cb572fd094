package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Set-operation layer (SURVEY.md §2b G17): UNION ALL / UNION DISTINCT /
  * INTERSECT / EXCEPT. Spark plans distinct-flavored set ops as
  * aggregates over the union — same partial/final shuffle shape as any
  * groupBy, so they scale like one.
  */
object SetOps {

  def all: Seq[Q] = Seq(

    // G17: UNION ALL (bag semantics) — two filtered scans concatenated.
    Q("union_all_events",
      """SELECT event_type, COUNT(*) AS n FROM (
        |  SELECT event_type FROM events WHERE value > 100
        |  UNION ALL
        |  SELECT event_type FROM events WHERE user_id < 50
        |) GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      ev.filter(col("value") > 100).select("event_type")
        .unionAll(ev.filter(col("user_id") < 50).select("event_type"))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // G17: UNION (distinct) across two different tables' key domains.
    Q("union_distinct_keys",
      """SELECT c_nationkey AS nkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier
        |ORDER BY nkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nkey")))
        .distinct()
        .orderBy("nkey")
    },

    // G17: INTERSECT — customers that appear in orders.
    Q("intersect_keys",
      """SELECT c_custkey AS k FROM customer
        |INTERSECT
        |SELECT o_custkey FROM orders
        |ORDER BY k""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("k"))
        .intersect(Tables.orders(s, d).select(col("o_custkey").as("k")))
        .orderBy("k")
    },

    // G17: EXCEPT — customers minus customers with a 1995 order (every
    // simpler EXCEPT over this dense synthetic data comes out empty;
    // this one keeps 326 rows at sf0.01).
    Q("except_keys",
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |ORDER BY k""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("k"))
        .except(Tables.orders(s, d)
          .filter(year(col("o_orderdate")) === 1995)
          .select(col("o_custkey").as("k")))
        .orderBy("k")
    },

    // G17: EXCEPT ALL — bag semantics: each custkey survives with
    // multiplicity (orders − 1), since customer holds it exactly once.
    // Surviving duplicates are identical rows, so ORDER BY k is
    // hash-safe despite the ties.
    Q("except_all_keys",
      """SELECT o_custkey AS k FROM orders
        |EXCEPT ALL
        |SELECT c_custkey FROM customer
        |ORDER BY k""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(col("o_custkey").as("k"))
        .exceptAll(Tables.customer(s, d).select(col("c_custkey").as("k")))
        .orderBy("k")
    },

    // G17: INTERSECT ALL — min(total orders, 1995 orders) copies per key.
    Q("intersect_all_keys",
      """SELECT o_custkey AS k FROM orders
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |ORDER BY k""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(col("o_custkey").as("k"))
        .intersectAll(Tables.orders(s, d)
          .filter(year(col("o_orderdate")) === 1995)
          .select(col("o_custkey").as("k")))
        .orderBy("k")
    }
  )
}
