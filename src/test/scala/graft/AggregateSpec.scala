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

  test("TopKAgg: any reduce/merge split equals sort-take, ties broken by id") {
    import org.scalacheck.{Prop, Test => PTest}
    val agg = new graft.functions.Sketches.TopKAgg(5)
    val prop = Prop.forAll { (xs: List[(Double, Long)], cut0: Int) =>
      // unique ids, no NaN scores — the engine contract for (score, id)
      val clean = xs.filterNot(_._1.isNaN)
        .groupBy(_._2).map(_._2.head).toList
      val want = clean.sortBy { case (s, i) => (-s, i) }.take(5)
      val cut = if (clean.isEmpty) 0 else math.abs(cut0 % (clean.size + 1))
      val (l, r) = clean.splitAt(cut)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))).toList
      merged == want
    }
    assert(PTest.check(PTest.Parameters.default, prop).passed)
  }
}
