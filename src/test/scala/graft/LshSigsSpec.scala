package graft

import graft.functions.LshSigsEval
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the native multi-table LSH signature expression:
  * the generated signatures must equal an independent Scala
  * re-computation of "bit j set iff v · plane_j > 0" per table. */
class LshSigsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val nPlanes = 6
  private val nTables = 4
  private val dim = 64
  private val planes = Similarity.hyperplanes(nPlanes * nTables, dim)
  private val flat = planes.flatten.toArray

  test("expression signatures equal an independent per-table sign computation") {
    val vecs = Seq.tabulate(32)(i =>
      (i.toLong, Seq.tabulate(dim)(j => math.sin(i * 131 + j).toDouble)))
    val df = vecs.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val got = df.select(col("vec_id"),
        explode(LshSigsEval(col("v"), flat, nPlanes, nTables)).as("b"))
      .select(col("vec_id"), col("b.t"), col("b.sig"))
      .as[(Long, Int, Int)].collect().toSet

    val want = (for {
      (id, v) <- vecs
      t <- 0 until nTables
    } yield {
      var sig = 0
      for (j <- 0 until nPlanes) {
        val p = planes(t * nPlanes + j)
        val d = v.zip(p).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
        if (d > 0) sig |= 1 << j
      }
      (id, t, sig)
    }).toSet
    assert(got == want)
  }

  test("one struct per table, tables 0..n-1, deterministic across runs") {
    val df = sources.Tables.embeddings(spark, SparkTestSession.sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def sigs() = df.select(col("vec_id"),
        explode(LshSigsEval(col("v"), flat, nPlanes, nTables)).as("b"))
      .select(col("vec_id"), col("b.t"), col("b.sig"))
      .as[(Long, Int, Int)].collect().toSet
    val s1 = sigs()
    assert(s1.groupBy(_._1).forall { case (_, g) => g.map(_._2) == (0 until nTables).toSet })
    assert(sigs() == s1)
  }
}
