package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scalar layer (SURVEY.md §2b G1, G3–G9): scan/projection, predicates,
  * arithmetic, string/date/math/array/map-JSON functions — all pure
  * `org.apache.spark.sql.functions` composition so every query stays
  * inside whole-stage codegen and Catalyst pushes filters/pruning to the
  * parquet scan.
  *
  * Oracle parity rules (SURVEY.md §5.2(3)): integer-ish results are cast
  * to BIGINT on BOTH sides (DuckDB scalar fns return int64 where Spark
  * returns int32), floats are produced by identical double arithmetic,
  * every query ends in ORDER BY over a unique key.
  */
object Scalars {

  def all: Seq[Q] = Seq(

    // G1: parquet scan + projection (identity select).
    Q("scan_project",
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey") { (s, d) =>
      Tables.region(s, d).select("r_regionkey", "r_name").orderBy("r_regionkey")
    },

    // G4: compound predicates — AND/OR/NOT, IN, BETWEEN, timestamp compare.
    Q("filter_predicates",
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20
        |  AND l_returnflag IN ('A', 'R')
        |  AND (l_linestatus = 'F' OR l_discount < 0.05)
        |  AND NOT (l_tax > 0.07)
        |  AND l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin) { (s, d) =>
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // order by every output column for a deterministic row order.
      Tables.lineitem(s, d)
        .filter(col("l_quantity").between(10, 20)
          && col("l_returnflag").isin("A", "R")
          && (col("l_linestatus") === "F" || col("l_discount") < 0.05)
          && !(col("l_tax") > 0.07)
          && col("l_shipdate") >= to_timestamp(lit("1995-06-01 00:00:00")))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
    },

    // G4: LIKE / prefix / suffix predicates.
    Q("like_predicates",
      """SELECT p_partkey, p_name, p_type
        |FROM part
        |WHERE p_name LIKE '%widget%' AND p_type LIKE 'ECO%' AND p_name NOT LIKE 'small%'
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_name").like("%widget%")
          && col("p_type").like("ECO%")
          && !col("p_name").like("small%"))
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    },

    // G3: column arithmetic + CASE WHEN. Double arithmetic is identical
    // IEEE ops on identical inputs in both engines. Rounding happens at
    // the EXACT decimal width of the true value (price 2dp × discount 2dp
    // → 4dp product; ×tax 2dp → 6dp): at that width both engines recover
    // the same decimal, whereas round(x, 2) diverges on .xx5 boundaries
    // (Spark rounds the shortest decimal repr, DuckDB the raw binary).
    Q("project_arithmetic",
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * (1 - l_discount), 4) AS revenue,
        |  round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge,
        |  CASE WHEN l_quantity >= 30 THEN 'bulk'
        |       WHEN l_quantity >= 10 THEN 'mid' ELSE 'small' END AS qty_tier
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, revenue, charge, qty_tier""".stripMargin) { (s, d) =>
      Tables.spread(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("charge"),
        when(col("l_quantity") >= 30, "bulk")
          .when(col("l_quantity") >= 10, "mid")
          .otherwise("small").as("qty_tier"))
        .orderBy("l_orderkey", "l_linenumber", "revenue", "charge", "qty_tier")
    },

    // G5: string functions.
    Q("string_functions",
      """SELECT c_custkey,
        |  upper(c_name) AS uname,
        |  lower(c_mktsegment) AS lseg,
        |  substring(c_name, 1, 8) AS pref,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  concat(c_mktsegment, '#', c_name) AS tagged,
        |  replace(c_name, 'Customer', 'Cust') AS shortname,
        |  regexp_replace(c_name, '[0-9]+', '', 'g') AS nodigits,
        |  lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
        |  CAST(strpos(c_name, '#') AS BIGINT) AS hashpos
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        lower(col("c_mktsegment")).as("lseg"),
        substring(col("c_name"), 1, 8).as("pref"),
        length(col("c_name")).cast("long").as("name_len"),
        concat(col("c_mktsegment"), lit("#"), col("c_name")).as("tagged"),
        regexp_replace(col("c_name"), "Customer", "Cust").as("shortname"),
        regexp_replace(col("c_name"), "[0-9]+", "").as("nodigits"),
        lpad(col("c_custkey").cast("string"), 12, "0").as("padded"),
        instr(col("c_name"), "#").cast("long").as("hashpos"))
        .orderBy("c_custkey")
    },

    // G6: date/time functions (session tz UTC on both engines).
    Q("date_functions",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  CAST(extract(epoch FROM o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")).cast("long").as("days_to_98"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy("o_orderkey")
    },

    // G7: math functions (all double in, double out; ln/log10/sqrt on
    // strictly-positive inputs).
    Q("math_functions",
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS adisc,
        |  round(l_extendedprice, 1) AS price1,
        |  CAST(ceil(l_quantity) AS BIGINT) AS cq,
        |  CAST(floor(l_quantity) AS BIGINT) AS fq,
        |  pow(l_quantity, 2) AS q2,
        |  sqrt(l_extendedprice) AS sq,
        |  round(ln(l_extendedprice), 9) AS lnp,
        |  round(log10(l_extendedprice), 9) AS lgp,
        |  CAST(mod(l_linenumber, 3) AS BIGINT) AS m3,
        |  greatest(l_discount, l_tax) AS gdt,
        |  least(l_discount, l_tax) AS ldt
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, adisc, price1, q2, m3""".stripMargin) { (s, d) =>
      Tables.spread(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("adisc"),
        round(col("l_extendedprice"), 1).as("price1"),
        ceil(col("l_quantity")).as("cq"),
        floor(col("l_quantity")).as("fq"),
        pow(col("l_quantity"), 2).as("q2"),
        sqrt(col("l_extendedprice")).as("sq"),
        // libm transcendentals differ by 1 ulp between JVM and DuckDB —
        // round to 9dp (sqrt is IEEE-exact and needs none).
        round(log(col("l_extendedprice")), 9).as("lnp"),
        round(log10(col("l_extendedprice")), 9).as("lgp"),
        (col("l_linenumber") % 3).cast("long").as("m3"),
        greatest(col("l_discount"), col("l_tax")).as("gdt"),
        least(col("l_discount"), col("l_tax")).as("ldt"))
        .orderBy("l_orderkey", "l_linenumber", "adisc", "price1", "q2", "m3")
    },

    // G8: array / higher-order functions over token lists and embeddings.
    Q("array_functions",
      """SELECT doc_id,
        |  CAST(len(t) AS BIGINT) AS ntok,
        |  array_to_string(t[1:3], ' ') AS first3,
        |  t[len(t)] AS lastw,
        |  CAST(len(list_distinct(t)) AS BIGINT) AS nuniq,
        |  CAST(list_sum(list_transform(t, x -> len(x))) AS BIGINT) AS total_chars,
        |  list_contains(t, 'data') AS has_data
        |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val t = split(col("text"), " ")
      Tables.documents(s, d).select(
        col("doc_id"),
        size(t).cast("long").as("ntok"),
        array_join(slice(t, 1, 3), " ").as("first3"),
        element_at(t, -1).as("lastw"),
        size(array_distinct(t)).cast("long").as("nuniq"),
        aggregate(t, lit(0L), (acc, x) => acc + length(x)).as("total_chars"),
        array_contains(t, "data").as("has_data"))
        .orderBy("doc_id")
    },

    // G8b: vector norms via aggregate/zip_with HOFs (groundwork for X3).
    Q("vector_norms",
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 4) AS l2,
        |  round(list_sum(CAST(embedding AS DOUBLE[])), 4) AS s1
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      val e = col("embedding").cast("array<double>")
      Tables.embeddings(s, d).select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(sqrt(aggregate(e, lit(0.0), (a, x) => a + x * x)), 4).as("l2"),
        round(aggregate(e, lit(0.0), (a, x) => a + x), 4).as("s1"))
        .orderBy("vec_id")
    },

    // G9: JSON extraction over events.props (stringly-typed JSON column).
    // ONE from_json parse feeds both outputs — parsing twice
    // (get_json_object + from_json) doubles the dominant cost of the
    // query; Catalyst's common-subexpression elimination handles the
    // shared map within the projection.
    Q("json_functions",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  array_to_string(json_keys(props), ',') AS key_list
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val props = from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))
      Tables.spread(s, d, "events").select(
        col("event_id"),
        // try_element_at: null on absent key, matching get_json_object
        // semantics (plain element_at throws under ANSI mode)
        try_element_at(props, lit("k")).cast("long").as("k_val"),
        array_join(map_keys(props), ",").as("key_list"))
        .orderBy("event_id")
    },

    // G9b: VARIANT ingestion (Spark 4's semi-structured type): parse the
    // JSON once into a binary variant, then typed-path extraction —
    // unlike from_json there is no up-front schema, so heterogeneous
    // payloads ride one column and each consumer extracts the paths it
    // needs. The parse is scan-local; the aggregate after it is an
    // ordinary partial/final hash agg on event_type. Sum is exact int64;
    // the avg is derived sum/count so both engines divide identical
    // exact integers (no accumulation-order drift).
    Q("variant_json",
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  round(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) / CAST(count(*) AS DOUBLE), 6) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.spread(s, d, "events")
        .select(col("event_type"),
          variant_get(parse_json(col("props")), "$.k", "bigint").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          round(sum(col("k")) / count(lit(1)).cast("double"), 6).as("avg_k"))
        .orderBy("event_type")
    }
  )
}
