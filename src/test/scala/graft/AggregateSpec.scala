package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AggregateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on lineitem part keys") {
    val li = sources.Tables.lineitem(spark, SparkTestSession.sf001)
    val rows = li.groupBy("l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact"),
        approx_count_distinct($"l_partkey", 0.02).as("approx"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, exact, approx) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.05, s"flag=$flag exact=$exact approx=$approx err=$err")
    }
  }

  test("decimal-cast sum is exact and partition-order independent") {
    val li = sources.Tables.lineitem(spark, SparkTestSession.sf0001)
    val a = li.agg(sum($"l_quantity".cast("decimal(18,2)"))).as[java.math.BigDecimal].head()
    val b = li.repartition(13).agg(sum($"l_quantity".cast("decimal(18,2)")))
      .as[java.math.BigDecimal].head()
    assert(a.compareTo(b) == 0)
  }

  test("rollup produces per-group, subtotal and grand-total rows") {
    val o = sources.Tables.orders(spark, SparkTestSession.sf0001)
    val r = o.rollup("o_orderstatus").agg(count(lit(1)).as("n"))
    val total = r.filter($"o_orderstatus".isNull).select("n").as[Long].head()
    assert(total == o.count())
  }
}
