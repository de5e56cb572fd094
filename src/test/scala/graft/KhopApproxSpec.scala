package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X68's documented scale valve, proven: the HLL k-hop variant must
  * track the exact counts within sketch tolerance at sf0.1 (VERDICT
  * r04 task 2). rsd is configured at 4%; the assertions leave headroom
  * (mean ≤ 5%, max ≤ 15%) so the bound red-lines real regressions —
  * a wrong expansion or a mis-wired tag — not sketch noise. */
class KhopApproxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import SparkTestSession.sf01

  test("khop_2_reach_approx stays within HLL tolerance of exact at sf0.1") {
    val exact = SparkEntry.queries("khop_2_reach")(spark, sf01)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = SparkEntry.queries("khop_2_reach_approx")(spark, sf01)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    assert(approx.keySet == exact.keySet,
      "the valve must cover exactly the exact query's node universe")

    def errs(pick: ((Long, Long)) => Long): Seq[(Double, Double)] =
      exact.toSeq.map { case (node, ex) =>
        val e = pick(ex).toDouble
        val a = pick(approx(node)).toDouble
        (math.abs(a - e), math.abs(a - e) / math.max(e, 1.0))
      }
    for ((label, es) <- Seq("n_1hop" -> errs(_._1), "n_2hop" -> errs(_._2))) {
      val mean = es.map(_._2).sum / es.size
      assert(mean <= 0.05, f"$label mean relative error $mean%.4f exceeds 5%%")
      // per-node: within 15% relative OR a small absolute slack — HLL's
      // relative guarantee is asymptotic; at cardinality ~2 a ±1 blip
      // is sketch-normal, not a regression
      es.foreach { case (abs, rel) =>
        assert(rel <= 0.15 || abs <= 3.0,
          f"$label node off by $abs%.0f (rel $rel%.3f) — beyond sketch tolerance")
      }
    }
  }
}
