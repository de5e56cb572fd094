package graft

/** Dev tool: dump executed plans of selected queries (not a test).
  * Run: sbt "Test/runMain graft.ExplainDump ngram_count tfidf". */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, d).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
