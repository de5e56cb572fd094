package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** G29 extension: the TPC-H composite shapes the r04 registry didn't yet
  * cover — Q4 (correlated EXISTS count), Q6 (tight-filter scan agg), Q7
  * (nation-pair volume), Q8 (market share via conditional agg), Q9
  * (profit rollup), Q10 (returned-item top-k), Q14 (promo share), Q16
  * (distinct-supplier counts), Q19 (disjunctive predicate revenue) —
  * adapted to the driver schema (no commit/receipt dates, no partsupp;
  * lineitem's supplier stands in for partsupp, a 30-day late-ship
  * predicate stands in for receipt-vs-commit).
  *
  * Cross-engine float discipline (the registry convention): money sums
  * accumulate as DECIMAL(28,4) and cast to DOUBLE once; every division
  * happens on identical doubles; decimal literals in DuckDB are wrapped
  * CAST(... AS DOUBLE) so both engines compare doubles, not DECIMALs.
  *
  * 100 TB posture: every join keys on l_orderkey / l_partkey /
  * l_suppkey / o_custkey (high-cardinality fact keys — shuffles
  * spread); nation/region/part-filter sides are dimension-sized and
  * broadcast by AQE; the Q4 EXISTS decorrelates to ONE left-semi join,
  * never a per-row subquery; Q8/Q14's share numerators are conditional
  * aggregates in the SAME pass as the denominator (one shuffle, not
  * two joined aggregations); top-k endings are TakeOrderedAndProject.
  */
object TpchMore {

  private def rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
    .cast(DecimalType(28, 4))

  def all: Seq[Q] = Seq(

    // Q4-style: priority bucket counts of orders with at least one
    // "late" line (shipped > 30 days after ordering) — correlated
    // EXISTS decorrelated to a left-semi join on the order key.
    Q("tpch_q4ish",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .join(Tables.lineitem(s, d),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // Q6-style: the forecasting-revenue-change scan — a tight
    // conjunctive filter straight into one global aggregate; the whole
    // query is a single parquet scan with every predicate pushed.
    Q("tpch_q6ish",
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
        |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount")).cast(DecimalType(28, 4)))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // Q7-style: trade volume between every ordered nation pair by ship
    // year (supplier nation ships to customer nation).
    Q("tpch_q7ish",
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        |JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        |WHERE sn.n_name < cn.n_name
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
      val sn = Tables.nation(s, d)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val cn = Tables.nation(s, d)
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(broadcast(sn), col("sn_key") === col("s_nationkey"))
        .join(broadcast(cn), col("cn_key") === col("c_nationkey"))
        .filter(col("supp_nation") < col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // Q8-style: market share — of all ECONOMY-part revenue bought by
    // ASIA-region customers, the fraction supplied by NATION_5, per
    // order year. Numerator and denominator come out of ONE conditional
    // aggregation pass.
    Q("tpch_q8ish",
      """WITH v AS (
        |  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4)) AS vol,
        |    sn.n_name AS supp_nation
        |  FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = cn.n_regionkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        |  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY')
        |SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol
        |                ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) AS nation_volume,
        |  CAST(SUM(vol) AS DOUBLE) AS total_volume,
        |  round(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol
        |                      ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
        |    / CAST(SUM(vol) AS DOUBLE), 9) AS mkt_share
        |FROM v GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, d) =>
      val cn = Tables.nation(s, d)
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
      val sn = Tables.nation(s, d)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val v = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "ECONOMY")
          .select("p_partkey")), col("p_partkey") === col("l_partkey"))
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(broadcast(cn), col("cn_key") === col("c_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")
          .select("r_regionkey")), col("r_regionkey") === col("cn_region"))
        .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(sn), col("sn_key") === col("s_nationkey"))
        .select(year(col("o_orderdate")).cast("long").as("o_year"),
          rev.as("vol"), col("supp_nation"))
      val natVol = sum(when(col("supp_nation") === "NATION_5", col("vol"))
        .otherwise(lit(0).cast(DecimalType(28, 4)))).cast("double")
      v.groupBy("o_year")
        .agg(natVol.as("nation_volume"),
          sum(col("vol")).cast("double").as("total_volume"),
          round(natVol / sum(col("vol")).cast("double"), 9).as("mkt_share"))
        .orderBy("o_year")
    },

    // Q9-style: per-supplier-nation profit on red-named parts by
    // order year (no partsupp cost column in the driver schema — profit
    // is the discounted revenue).
    Q("tpch_q9ish",
      """SELECT sn.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS profit
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE p.p_name LIKE '%red%'
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_name").like("%red%"))
          .select("p_partkey")), col("p_partkey") === col("l_partkey"))
        .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("nation"))),
          col("sn_key") === col("s_nationkey"))
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(rev).cast("double").as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // Q10-style: returned-item reporting — customers ranked by revenue
    // lost to 'R'-flagged returns in one quarter-ish window; classic
    // fact⋈fact⋈dim rollup ending in TakeOrderedAndProject.
    Q("tpch_q10ish",
      """SELECT c.c_custkey, c.c_name,
        |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |  c.c_acctbal, n.n_name
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1997-07-01 00:00:00"))),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.nation(s, d)), col("n_nationkey") === col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(rev).cast("double").as("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // Q14-style: promo revenue share in one month — numerator and
    // denominator in a single aggregation pass, one division at the end.
    Q("tpch_q14ish",
      """SELECT
        |  CAST(SUM(CASE WHEN p.p_type = 'PROMO'
        |    THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))
        |    ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) AS promo_revenue,
        |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS total_revenue,
        |  count(*) AS n_items
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-09-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-10-01 00:00:00")))
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_type")),
          col("p_partkey") === col("l_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast(DecimalType(28, 4)))).cast("double").as("promo_revenue"),
          sum(rev).cast("double").as("total_revenue"),
          count(lit(1)).as("n_items"))
    },

    // Q16-style: how many distinct suppliers ship each small
    // brand/type/size combination (lineitem stands in for partsupp).
    Q("tpch_q16ish",
      """SELECT p.p_brand, p.p_type, p.p_size,
        |  count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 2, 3, 4, 5)
        |GROUP BY p.p_brand, p.p_type, p.p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#1" && col("p_size").isin(1, 2, 3, 4, 5))
        .join(Tables.lineitem(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    // Q19-style: disjunctive brand × size × quantity bands — the
    // OR-of-ANDs predicate a row-store pushes poorly and a columnar
    // scan + broadcast dim join handles in one pass.
    Q("tpch_q19ish",
      """SELECT
        |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity >= 1 AND l.l_quantity <= 15)
        |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20 AND l.l_quantity >= 10 AND l.l_quantity <= 25)
        |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity >= 20 AND l.l_quantity <= 35)""".stripMargin) { (s, d) =>
      val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
      Tables.lineitem(s, d)
        .join(broadcast(p), col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("l_quantity") >= 1 && col("l_quantity") <= 15) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(5, 20) &&
              col("l_quantity") >= 10 && col("l_quantity") <= 25) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(10, 30) &&
              col("l_quantity") >= 20 && col("l_quantity") <= 35))
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
    },

    // Q12-style: late-shipment priority split. The driver schema has no
    // l_shipmode, so l_returnflag stands in as the grouping; "late" =
    // shipped >60 days after ordering (no commit/receipt dates). One
    // fact⋈fact equi-join on the order key with the year filter pushed
    // to the orders scan; both CASE counts ride the same aggregation
    // pass (count, not sum: DuckDB's sum(int) widens to HUGEINT,
    // count stays BIGINT in both engines).
    Q("tpch_q12ish",
      """SELECT l.l_returnflag,
        |  count(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
        |  count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
          count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)).as("high_line_count"),
          count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)).as("low_line_count"))
        .orderBy("l_returnflag")
    },

    // Q13-style: customer order-count distribution — the classic LEFT
    // OUTER join + double aggregation (customers with zero qualifying
    // orders must land in the c_count=0 bucket, which an inner join
    // silently drops). The priority exclusion stands in for Q13's
    // comment-pattern filter and lives in the JOIN CONDITION, not a
    // WHERE (a WHERE would turn the outer join back into an inner).
    // Both aggregations are hash-shaped: |customers| rows into the
    // first, |distinct counts| into the second.
    Q("tpch_q13ish",
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o
        |    ON o.o_custkey = c.c_custkey
        |   AND o.o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c.c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select("c_custkey")
        .join(
          Tables.orders(s, d).filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
            .select("o_custkey", "o_orderkey"),
          col("o_custkey") === col("c_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q15-style: top supplier(s) by quarterly revenue — per-supplier
    // DECIMAL revenue aggregate, then the scalar max joined back as a
    // one-row broadcast (Catalyst plans the = (SELECT max ...) exactly
    // so); ties all surface, as in the spec. Supplier names attach
    // AFTER the top filter, so the dimension join touches only the
    // winners.
    Q("tpch_q15ish",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name, r.total_revenue
        |FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        |WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s.s_suppkey""".stripMargin) { (s, d) =>
      val revenue = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(rev).cast("double").as("total_revenue"))
      revenue
        .join(broadcast(revenue.agg(max(col("total_revenue")).as("best"))),
          col("total_revenue") === col("best"))
        .join(Tables.supplier(s, d), col("s_suppkey") === col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    }
  )
}
