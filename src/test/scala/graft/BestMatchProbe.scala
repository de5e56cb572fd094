package graft

import graft.functions.TextFns
import graft.operators.Clustering
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing probe for best_match_fuzzy (r17): attributes
  * wall-clock across the content-key pass, rep selection, fingerprint
  * blocking, bucket scoring, and fan-out so the 100× cost driver is
  * measured, not guessed. Diagnostic only — not part of the library. */
object BestMatchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[bmprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.sources.Tables.documents(spark, d)
    t("docs.count")(docs.count())
    def setsOf(dd: org.apache.spark.sql.DataFrame) = dd
      .select(col("doc_id"), array_distinct(TextFns.ngrams(col("text"), 3)).as("s"))
      .filter(size(col("s")) > 0)
    val keys = t("keys checkpoint")(setsOf(docs)
      .select(col("doc_id"),
        sha2(array_join(array_sort(col("s")), "\u0001"), 256).as("ck"))
      .localCheckpoint())
    val repIds = keys.groupBy(col("ck"), pmod(col("doc_id"), lit(2)).as("par"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    println(s"[bmprobe] nDocs=${keys.count()} nReps=${t("repIds.count")(repIds.count())}")
    val repDocs = docs.join(repIds, Seq("doc_id"), "left_semi")
    val memb = Clustering.fingerprintBuckets(repDocs)
    val membSets = t("membSets checkpoint")(
      memb.join(setsOf(repDocs).select(col("doc_id"),
          array_sort(array_distinct(transform(col("s"),
            x => xxhash64(x)))).as("sh")),
        "doc_id").localCheckpoint())
    val inter = size(array_intersect(col("sb"), col("sc"))).cast("double")
    val union = (size(col("sb")) + size(col("sc"))).cast("double") - inter
    val repResult = membSets.filter(col("doc_id") % 2 === 1)
      .select(col("bucket"), col("doc_id").as("bdoc"), col("sh").as("sb"))
      .join(membSets.filter(col("doc_id") % 2 === 0)
        .select(col("bucket"), col("doc_id").as("cdoc"), col("sh").as("sc")), "bucket")
      .select(col("bdoc"), col("cdoc"), (inter / union).as("jac"))
      .groupBy("bdoc")
      .agg(max(struct(col("jac"), (-col("cdoc")).as("nc"))).as("m"))
      .select(col("bdoc"),
        (-col("m.nc")).cast("long").as("match_id"),
        round(col("m.jac"), 9).as("jaccard"))
    t("repResult noop")(repResult.write.format("noop").mode("overwrite").save())
    val repOdd = keys.filter(col("doc_id") % 2 === 1)
      .join(repIds, Seq("doc_id"), "left_semi")
      .select(col("ck"), col("doc_id").as("bdoc"))
    val out = keys.filter(col("doc_id") % 2 === 1).select(col("doc_id"), col("ck"))
      .join(repOdd, "ck")
      .join(repResult, "bdoc")
      .select(col("doc_id"), col("match_id"), col("jaccard"))
      .orderBy("doc_id")
    t("full output noop")(out.write.format("noop").mode("overwrite").save())
    t("registry query e2e")(SparkEntry.queries("best_match_fuzzy")(spark, d)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
