package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print a registry query's FINAL executed plan (collect()
  * first so AQE finalizes — the bm25_rank/doc_bigram_surprise pattern).
  *   sbt "Test/runMain graft.PlanPeek <query> [sfDir]"
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val df = SparkEntry.queries(args(0))(spark, d)
    df.collect()
    println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    spark.stop()
  }
}
