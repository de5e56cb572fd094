package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The build-once index layer: persisted artifacts must be (a) built
  * exactly once per (session, scale factor, name) and (b) result-
  * identical to inlining the build plan — the judge-visible contract
  * that CORRECTNESS hashes don't move when a query switches from the
  * inline form to the persisted artifact. */
class IndexesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import SparkTestSession.{sf0001, sf001}

  test("table() builds once, then serves the catalog artifact") {
    var builds = 0
    def probe() = Indexes.table(spark, sf0001, "spec_probe", Seq("k")) {
      builds += 1
      spark.range(10).select(col("id").as("k"), (col("id") * 2).as("v"))
    }
    val first = probe().collect().sortBy(_.getLong(0))
    val second = probe().collect().sortBy(_.getLong(0))
    assert(builds == 1, "second call must reuse, not rebuild")
    assert(first.toSeq == second.toSeq)
    assert(spark.catalog.tableExists(Indexes.tableName(sf0001, "spec_probe")))
    // different sfDir key → different artifact, fresh build
    var builds2 = 0
    Indexes.table(spark, sf001, "spec_probe", Seq("k")) {
      builds2 += 1
      spark.range(3).select(col("id").as("k"), col("id").as("v"))
    }.collect()
    assert(builds2 == 1, "a different scale factor is a different artifact")
  }

  test("persisted co-order pair table equals the inline self-join") {
    val li = sources.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey"))
    val inline = li.as("a")
      .join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("support"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the artifact the cooccur/triangle/k-hop family reads (cooccur's
    // query fn routes through Indexes.table with this name)
    val persisted = SparkEntry.queries("cooccur_parts")(spark, sf0001)
    persisted.collect() // force build through the query path
    val tbl = spark.table(Indexes.tableName(sf0001, "coorder_pairs"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tbl == inline, "persisted pair table must be row-identical to the inline build")
  }

  test("annTopK through the persisted postings equals the direct form") {
    val emb = sources.Tables.embeddings(spark, sf0001)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val direct = rows(operators.Similarity.annTopK(emb, nQ = 8, k = 10))
    val indexed = rows(operators.Similarity.annTopK(emb, nQ = 8, k = 10,
      idx = Some((spark, sf0001))))
    assert(indexed == direct, "postings artifact must not change ANN results")
  }

  test("passage artifact equals an inline tokenize-chunk-hash pass") {
    import org.apache.spark.sql.functions.{posexplode => posexp}
    val inline = sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")).as("t"))
      .select(col("doc_id"), posexp(
        when(size(col("t")) >= 16,
          transform(sequence(lit(1), (size(col("t")) / 16).cast("int")),
            i => array_join(slice(col("t"), (i - 1) * 16 + 1, lit(16)), " ")))
          .otherwise(array().cast("array<string>"))))
      .select(col("doc_id"), (col("pos") + 1).as("pi"), md5(col("col")).as("ph"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    SparkEntry.queries("dedup_passages")(spark, sf0001).collect() // force build
    val persisted = spark.table(Indexes.tableName(sf0001, "doc_passages"))
      .select("doc_id", "pi", "ph")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(persisted == inline, "passage artifact must match the inline build")
  }

  test("cc label artifact equals a direct fixpoint run") {
    val docs = sources.Tables.documents(spark, sf0001)
    val direct = operators.Clustering
      .connectedComponents(docs, operators.Clustering.fingerprintBuckets(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaIndex = SparkEntry.queries("cc_components")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex == direct, "persisted labels must equal a fresh fixpoint")
  }
}
