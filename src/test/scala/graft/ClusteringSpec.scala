package graft

import graft.operators.Clustering
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X21 connected-components dedup clustering. */
class ClusteringSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("planted bipartite graph resolves exact union-find components") {
    // docs 1-2-3 chained through buckets a,b; 4-5 through c; 6 isolated;
    // 7-8-9-10 a 3-bucket chain (exercises multi-round propagation).
    val memb = Seq(
      1L -> "a", 2L -> "a", 2L -> "b", 3L -> "b",
      4L -> "c", 5L -> "c",
      7L -> "d", 8L -> "d", 8L -> "e", 9L -> "e", 9L -> "f", 10L -> "f"
    ).toDF("doc_id", "bucket")
    val docs = (1L to 10L).toDF("doc_id")
    val got = Clustering.connectedComponents(docs, memb)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val want = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 7L, 10L -> 7L)
    assert(got == want)
  }

  test("long chain converges well under the round cap (log-round contraction)") {
    // 200-doc chain: doc i and i+1 share bucket i. Pure 2-hop propagation
    // would need ~100 rounds; contraction must finish in far fewer.
    val memb = (1L until 200L).flatMap(i => Seq(i -> i, (i + 1) -> i))
      .toDF("doc_id", "bucket")
    val docs = (1L to 200L).toDF("doc_id")
    val lab = Clustering.connectedComponents(docs, memb, maxRounds = 12)
    assert(lab.agg(countDistinct(col("component"))).as[Long].head() == 1L)
    assert(lab.agg(min(col("component")), max(col("component")))
      .as[(Long, Long)].head() == ((1L, 1L)))
  }

  test("fingerprint-bucket components on sf0.001 satisfy CC invariants") {
    val docs = sources.Tables.documents(spark, sf0001)
    val memb = Clustering.fingerprintBuckets(docs)
    val lab = Clustering.connectedComponents(docs, memb).cache()
    try {
      // total coverage, component id = a member's doc_id = min member.
      assert(lab.count() == docs.count())
      val badId = lab.groupBy("component").agg(min(col("doc_id")).as("m"))
        .filter(col("component") =!= col("m")).count()
      assert(badId == 0L, "component label must be the min member doc_id")
      // fixpoint property: every bucket is label-uniform.
      val mixed = memb.join(lab, "doc_id")
        .groupBy("bucket").agg(countDistinct(col("component")).as("k"))
        .filter(col("k") > 1).count()
      assert(mixed == 0L, "shared bucket ⇒ same component")
    } finally lab.unpersist()
  }
}
