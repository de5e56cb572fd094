package graft

import graft.functions.VecDotEval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native vec_dot must be BIT-identical to the HOF fold it
  * replaced — the DuckDB oracle parity of every cosine query rests on
  * the accumulation order. */
class VecDotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("native == HOF fold, bit for bit, on real embeddings") {
    val emb = sources.Tables.embeddings(spark, SparkTestSession.sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = emb.as("a").join(emb.as("b"),
        col("a.vec_id") === col("b.vec_id") + 1)
      .select(
        VecDotEval(col("a.v"), col("b.v")).as("native"),
        hofDot(col("a.v"), col("b.v")).as("hof"),
        VecDotEval(col("a.v"), col("a.v")).as("native_n2"),
        aggregate(col("a.v"), lit(0.0), (acc, x) => acc + x * x).as("hof_n2"))
    val rows = pairs.as[(Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, h, n2, h2) =>
      assert(n == h, s"dot: native $n != hof $h")   // exact, not approx
      assert(n2 == h2, s"norm2: native $n2 != hof $h2")
    }
  }

  test("interpreted path matches codegen (adversarial values, ragged lengths)") {
    // NaN/Inf/denormal values exercise the fold identically both ways;
    // ragged lengths pin the documented shorter-length-wins contract
    val a = Seq(1.0, -2.5, Double.MinPositiveValue, 1e300, -1e300, 3.14)
    val b = Seq(0.5, 4.0, 2.0, 1e10, 1e10, -1.0)
    def refDot(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p * q }
    def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
    val got = Seq((a, b)).toDF("a", "b")
      .select(VecDotEval(col("a"), col("b"))).as[Double].head()
    // overflow makes this NaN on both sides — compare bit patterns
    assert(bits(got) == bits(refDot(a, b)))
    val ragged = Seq((a, b.take(3))).toDF("a", "b")
      .select(VecDotEval(col("a"), col("b"))).as[Double].head()
    assert(ragged == refDot(a.take(3), b.take(3)))
  }
}
