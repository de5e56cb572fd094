package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X28 count-min sketch: the one-sided error guarantee must hold in the
  * collision regime, and the wide sketch must be collision-free (exact)
  * on the corpus vocabulary. */
class CmsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = sources.Tables.documents(spark, sf001)

  private def exact = docs
    .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
    .groupBy("w").agg(count(lit(1)).as("exact"))

  test("wide sketch (w=1024) is exact on the corpus vocabulary") {
    val joined = HeavyHitters.tokenFrequencies(docs)
      .join(exact, "w")
    assert(joined.filter(col("est") =!= col("exact")).count() == 0)
  }

  test("narrow sketch (w=8) forces collisions but NEVER underestimates") {
    val joined = HeavyHitters.tokenFrequencies(docs, d = 2, w = 8)
      .join(exact, "w").cache()
    try {
      assert(joined.filter(col("est") < col("exact")).count() == 0,
        "count-min must be one-sided")
      assert(joined.filter(col("est") > col("exact")).count() > 0,
        "w=8 over a 31-word vocabulary must collide somewhere")
    } finally joined.unpersist()
  }

  test("X73 hll_rolling_users: estimates track the exact rolling distinct within 5%") {
    val est = SparkEntry.queries("hll_rolling_users")(spark, sf001)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("dau_est"), r.getAs[Long]("wau7_est"))).toMap
    val exact = SparkEntry.queries("rolling_active_users")(spark, sf001)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau7"))).toMap
    assert(est.keySet == exact.keySet, "sketch path must keep the same day spine")
    exact.foreach { case (day, (dau, wau)) =>
      val (de, we) = est(day)
      def ok(e: Long, x: Long) =
        if (x == 0) e == 0
        else math.abs(e - x).toDouble / x <= 0.05
      assert(ok(de, dau), s"$day dau est $de vs exact $dau drifts > 5%")
      assert(ok(we, wau), s"$day wau est $we vs exact $wau drifts > 5%")
    }
  }
}
