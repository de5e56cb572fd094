package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time the sub-stages of doc_bigram_surprise in isolation
  * (noop sink each) to locate the dominant cost at sf0.1. */
object BigramProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // NOT dead config on micros fixtures (it is a no-op there): this flag
      // is what makes a TIMESTAMP(NANOS) fixture regen READABLE at all —
      // Spark 4 otherwise rejects the parquet type, while with the flag it
      // reads as int64 and Tables.normalizeTs routes it adaptively.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import graft.functions.TextFns
    import graft.sources.Tables
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val toks = Tables.documents(spark, d)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
    val bg = toks
      .select(col("doc_id"), explode(
        when(size(col("t")) >= 2,
          transform(sequence(lit(1), size(col("t")) - 1),
            i => struct(element_at(col("t"), i).as("w1"),
              element_at(col("t"), i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bgd = bg.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("cnt"))
    val c2 = bgd.groupBy("w1", "w2").agg(sum(col("cnt")).as("n2"))

    time("tokenize-only")(toks.select(size(col("t")).as("n")))
    time("explode-bg")(bg.select(length(col("w1")).as("x")))
    time("bgd")(bgd)
    time("c2")(c2)
    println("[probe] bgd rows=" + bgd.count() + " c2 rows=" + c2.count() +
      " bg rows=" + bg.count())

    // Minimal diamond: does AQE stage reuse kick in for two consumers
    // of the same aggregate in this build?
    val diamond = bgd.join(c2, Seq("w1", "w2")).select(col("doc_id"), col("n2"))
    diamond.queryExecution.executedPlan.execute().count()
    val plan = diamond.queryExecution.executedPlan.toString
    println("[probe] diamond ReusedExchange count = " +
      "ReusedExchange".r.findAllIn(plan).size)
    println(plan.take(3000))
    spark.stop()
  }
}
