package graft.sources

import org.apache.spark.sql.DataFrame

/** Write surface (SURVEY.md §2b G24 / R2).
  *
  * Parquet is the engine's primary sink (columnar, splittable,
  * predicate-pushdown-able on re-read — what a 100 TB pipeline stores).
  * TSV text is the reference-fidelity sink: the reference job writes
  * `key\tvalue` lines, one file per reducer, via TextOutputFormat
  * (reference/WordCount.java:158) — combined with its range partitioner
  * the concatenated part files are globally sorted
  * (reference/report.md:139-145). `writeSortedTsv` reproduces exactly
  * that: range-repartition on the sort key, sort within partitions,
  * write one text part-file per range — parts concatenate to a global
  * sort, like the reference's reducer outputs.
  */
object Sinks {

  /** Plain TSV (no header, tab separator, no quoting of simple values):
    * the reference's `key\tvalue` line format. */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("sep", "\t")
      .option("header", "false")
      .csv(path)

  /** The reference's full sink contract: `numParts` range-partitioned,
    * in-partition-sorted TSV part files (reference/WordCount.java:32-62 +
    * 158: WCPartitioner + TextOutputFormat). */
  def writeSortedTsv(df: DataFrame, path: String, sortCol: String, numParts: Int): Unit =
    df.repartitionByRange(numParts, df(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite")
      .option("sep", "\t")
      .option("header", "false")
      .csv(path)

  /** Primary sink: parquet, optionally hive-style partitioned by
    * low-cardinality columns (partition pruning on re-read). */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
