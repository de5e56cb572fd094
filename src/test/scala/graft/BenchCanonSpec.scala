package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** r07 task 7: BENCH_CANON.json is the pinned clean-run per-query
  * reference `tools/bench_guard.py` gates against — round-over-round
  * "newest artifact" stopped being trustworthy when the r07 driver run
  * executed under heavy co-tenant contention (6–12× within-shard
  * spreads on pure scans). This spec keeps the canon honest CI-style:
  * it must cover exactly the live registry with no throwing-query
  * sentinels, so a contended or partial run can never silently become
  * the reference. Refresh after an intentional plan/registry change:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 sbt "runMain graft.Bench"`
  * then `cp BENCH_SELF_r*.json BENCH_CANON.json` (newest round).
  */
class BenchCanonSpec extends AnyFunSuite {

  test("BENCH_CANON covers the live query registry with positive medians") {
    val f = new java.io.File("BENCH_CANON.json")
    assert(f.exists(), "BENCH_CANON.json missing — seed it from a clean BENCH_SELF run")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
    val qs = root.get("queries")
    assert(qs != null && qs.isObject, "BENCH_CANON.json has no queries map")

    val canon = qs.fieldNames().asScala.toSet
    val registry = SparkEntry.queries.keySet

    val stale = canon -- registry
    assert(stale.isEmpty, s"canon queries no longer registered: ${stale.toSeq.sorted}")
    val uncovered = registry -- canon
    assert(uncovered.isEmpty,
      s"registry queries missing from canon (refresh it — see scaladoc): ${uncovered.toSeq.sorted}")

    val negative = canon.filter(n => qs.get(n).asDouble(-1.0) < 0)
    assert(negative.isEmpty,
      s"canon contains throwing-query sentinels (-1): ${negative.toSeq.sorted}")
  }
}
