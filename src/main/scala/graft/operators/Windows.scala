package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window-function layer (SURVEY.md §2b G14, G16). partition-by + order-by
  * is literally the MapReduce shuffle contract the reference relies on
  * (WCPartitioner + framework sort, reference/WordCount.java:32-62) —
  * Spark's WindowExec is that same mechanism exposed as an operator.
  *
  * Determinism: every window order-by carries a full tiebreak suffix —
  * the synthetic lineitem has duplicate (orderkey, linenumber) pairs, so
  * rank-like outputs would otherwise be nondeterministic between engines.
  * Running sums use exact-width DECIMAL (frame accumulation order is
  * engine-internal; decimal makes it irrelevant).
  */
object Windows {

  private val qtyD = DecimalType(18, 2)

  def all: Seq[Q] = Seq(

    // G14 ranking: row_number / rank / dense_rank / ntile, partitioned
    // by l_orderkey — a key whose cardinality GROWS with the data, so
    // window tasks stay bounded at any scale. (A ≤tens-cardinality key
    // like returnflag or suppkey funnels the whole table into a handful
    // of single-task sorts at 100 TB; for low-cardinality ranking use
    // the two-phase top-k rewrite instead — see Similarity.topKPerQuery.)
    Q("window_ranking",
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
        |  row_number() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_extendedprice DESC, l_linenumber, l_quantity) AS rn,
        |  rank() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC) AS rnk,
        |  dense_rank() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC) AS drnk,
        |  ntile(4) OVER (PARTITION BY l_orderkey
        |    ORDER BY l_extendedprice DESC, l_linenumber, l_quantity) AS quartile
        |FROM lineitem
        |ORDER BY l_orderkey, rn""".stripMargin) { (s, d) =>
      val byPrice = Window.partitionBy("l_orderkey")
        .orderBy(col("l_extendedprice").desc, col("l_linenumber"), col("l_quantity"))
      val rankW = Window.partitionBy("l_orderkey").orderBy(col("l_extendedprice").desc)
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        row_number().over(byPrice).as("rn"),
        rank().over(rankW).as("rnk"),
        dense_rank().over(rankW).as("drnk"),
        ntile(4).over(byPrice).as("quartile"))
        .orderBy("l_orderkey", "rn")
    },

    // G14 distribution functions: percent_rank / cume_dist / nth_value
    // over each customer's order-price distribution — the remaining
    // window family (ranking and analytic are covered above). Both
    // scores are integer-count-derived single divisions, identical in
    // IEEE across engines; the window key is o_custkey
    // (high-cardinality) with a unique (price, orderkey) sort.
    // (Named *_orders: the lineitem percent_rank/cume_dist query below
    // already holds the bare window_distribution name — a silent
    // last-wins collision in the name-keyed registry shadowed this one
    // in round 5; SparkEntry.all now rejects duplicates outright.)
    Q("window_distribution_orders",
      """SELECT o_custkey, o_orderkey,
        |  round(percent_rank() OVER w, 9) AS pr,
        |  round(cume_dist() OVER w, 9) AS cd,
        |  nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice"), col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        round(percent_rank().over(w), 9).as("pr"),
        round(cume_dist().over(w), 9).as("cd"),
        nth_value(col("o_totalprice"), 2).over(full).as("second_price"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // G14 analytic: lag / lead / first / last over each customer's order
    // history (o_orderkey is unique → deterministic).
    Q("window_analytic",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  lead(o_totalprice) OVER w AS next_price,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_orderkey")).over(w).as("first_order"),
        last(col("o_orderkey")).over(full).as("last_order"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // G14 aggregate-over-frame: running total + 4-row moving average per
    // supplier. DECIMAL inside the frame → accumulation-order free.
    Q("window_running",
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_qty,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |    OVER (PARTITION BY l_suppkey
        |          ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / COUNT(*) OVER (PARTITION BY l_suppkey
        |          ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS moving_avg
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_quantity, running_qty""".stripMargin) { (s, d) =>
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
      val base = Window.partitionBy("l_suppkey").orderBy(order: _*)
      val run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = base.rowsBetween(-3, Window.currentRow)
      Tables.lineitem(s, d).select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        sum(col("l_quantity").cast(qtyD)).over(run).cast("double").as("running_qty"),
        (sum(col("l_quantity").cast(qtyD)).over(mov).cast("double")
          / count(lit(1)).over(mov)).as("moving_avg"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("running_qty"))
    },

    // G14/G16: top-3 orders per customer (the windowed top-k idiom that
    // replaces a per-key sort at scale).
    Q("window_topk_per_group",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    },

    // G16: global top-k — Catalyst plans TakeOrderedAndProject (no full
    // sort of the input, a per-partition heap + driver merge of k rows).
    Q("top_k_orders",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // G15: multi-key global sort, asc/desc mixed, explicit null placement
    // (the data has no nulls, so nullif() manufactures them).
    Q("sort_multi_key",
      """SELECT l_orderkey, l_linenumber, nullif(l_returnflag, 'N') AS flag, l_quantity
        |FROM lineitem
        |ORDER BY flag ASC NULLS FIRST, l_quantity DESC, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_returnflag") === "N", lit(null)).otherwise(col("l_returnflag")).as("flag"),
          col("l_quantity"))
        .orderBy(col("flag").asc_nulls_first, col("l_quantity").desc,
          col("l_orderkey"), col("l_linenumber"))
    },

    // G14 distribution: percent_rank / cume_dist per order (scaling
    // partition key, like window_ranking). Both are rank-based — ties
    // share a value — so the peer ORDER BY needs no unique tiebreak;
    // rounding keeps the double division cross-engine comparable.
    Q("window_distribution",
      """SELECT l_orderkey, l_linenumber,
        |  round(percent_rank() OVER w, 9) AS pct_rank,
        |  round(cume_dist() OVER w, 9) AS cum_dist
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_quantity)
        |ORDER BY l_orderkey, l_linenumber, pct_rank""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("l_orderkey").orderBy("l_quantity")
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        round(percent_rank().over(w), 9).as("pct_rank"),
        round(cume_dist().over(w), 9).as("cum_dist"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data
        // (11785 dup pairs at sf0.01) — adding pct_rank makes remaining
        // ties bit-identical rows, so row order is hash-safe
        .orderBy("l_orderkey", "l_linenumber", "pct_rank")
    },

    // G14: ntile decile assignment. The window orders by (totalprice,
    // orderkey) — the unique-key tiebreak that makes tile boundaries
    // engine-independent (ties at a decile edge would otherwise land by
    // whichever engine's sort was stabler).
    Q("window_ntile",
      """SELECT o_orderkey, o_orderpriority,
        |  ntile(10) OVER (PARTITION BY o_orderpriority
        |                  ORDER BY o_totalprice, o_orderkey) AS decile
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority"),
        ntile(10).over(w).as("decile"))
        .orderBy("o_orderkey")
    },

    // G16 scale form: top-3 per group as a bounded-heap AGGREGATION
    // (Sketches.TopKAgg) — same answer as the row_number()<=k window
    // (the oracle), but with map-side partial merge and ≤k state per
    // group: on a 100 TB hot key the window form sorts the whole group
    // in one task; this form streams it.
    Q("topk_per_group_agg",
      """WITH r AS (
        |  SELECT event_type, value, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value DESC, event_id) AS rn
        |  FROM events)
        |SELECT event_type, CAST(rn AS INTEGER) AS rnk, value, event_id
        |FROM r WHERE rn <= 3 ORDER BY event_type, rnk""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(graft.functions.Sketches.topK(3)(
          col("value"), col("event_id")).as("top"))
        .select(col("event_type"), posexplode(col("top")))
        .select(col("event_type"), (col("pos") + 1).cast("int").as("rnk"),
          col("col._1").as("value"), col("col._2").as("event_id"))
        .orderBy("event_type", "rnk")
    }
  )
}
