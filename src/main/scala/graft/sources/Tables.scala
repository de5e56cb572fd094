package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All operator inputs come through here so scan behavior is uniform:
  * plain `spark.read.parquet` — Catalyst's DataSource V2 path gives
  * vectorized columnar reads, predicate pushdown and column pruning for
  * free, which is the 100 TB-posture scan we want (SURVEY.md §4.2).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects. Read it as a nanos long and truncate to microsecond
    * TimestampType — exactly what DuckDB does on read, so the oracle sees
    * identical values. Requires spark.sql.legacy.parquet.nanosAsLong=true,
    * set at SESSION BUILD by every entry point (Verify, Bench,
    * SparkTestSession) — not here: a table loader mutating session state
    * would surprise unrelated reads and concurrent callers. */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events needs spark.sql.legacy.parquet.nanosAsLong=true at session build " +
        "(events.ts is parquet TIMESTAMP(NANOS))")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Register every table as a temp view (entry point B: SQL over views).
    * `events` goes through [[events]] so the SQL surface sees the same
    * microsecond timestamps as the DataFrame surface. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else apply(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
