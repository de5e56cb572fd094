package graft

import graft.operators.Clustering
import org.scalatest.funsuite.AnyFunSuite

/** Dev-only wall-clock profile of the connected-components loop (like
  * IvfSweep): where do the seconds go — step A, compress jumps,
  * checkpoints? Run with `testOnly graft.CcProfile`. */
class CcProfile extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("profile") {
    sys.props("graft.cc.debug") = "true"
    // -Dgraft.cc.sf=/root/testdata/sf0.1 to profile at bench scale
    val sfDir = sys.props.getOrElse("graft.cc.sf", SparkTestSession.sf0001)
    val docs = sources.Tables.documents(spark, sfDir)
    val memb = Clustering.fingerprintBuckets(docs)
    val t0 = System.nanoTime()
    val out = Clustering.connectedComponents(docs, memb)
    out.count()
    println(f"connectedComponents total: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    sys.props -= "graft.cc.debug"
  }
}
