package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Statistical-operator checks that no SQL oracle can express: the
  * approximate-quantile sketch must land near the exact percentiles,
  * and the power-sum statistics must agree with Spark's own builtins
  * (two independent formulations of the same statistic). */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val li = sources.Tables.lineitem(spark, SparkTestSession.sf0001)

  test("approx_quantiles within 1% relative error of exact percentiles") {
    val approx = SparkEntry.queries("approx_quantiles")(spark, SparkTestSession.sf0001)
      .as[(String, Double, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))").as("q"))
      .as[(String, Seq[Double])].collect().toMap
    exact.foreach { case (flag, ex) =>
      approx(flag).zip(ex).foreach { case (a, e) =>
        assert(math.abs(a - e) / e < 0.01, s"$flag: approx $a vs exact $e")
      }
    }
  }

  test("power-sum variance/stddev/corr match Spark builtins") {
    val stats = SparkEntry.queries("stat_aggregates")(spark, SparkTestSession.sf0001)
      .select("l_returnflag", "var_qty", "std_qty", "corr_qp")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val builtin = li.groupBy("l_returnflag")
      .agg(var_samp(col("l_quantity")).as("v"),
        stddev_samp(col("l_quantity")).as("s"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    builtin.foreach { case (flag, (v, sd, c)) =>
      val (gv, gs, gc) = stats(flag)
      assert(math.abs(gv - v) / v < 1e-6, s"$flag var")
      assert(math.abs(gs - sd) / sd < 1e-6, s"$flag stddev")
      assert(math.abs(gc - c) < 1e-6, s"$flag corr")
    }
  }
}
