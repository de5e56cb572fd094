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
  /** `events.ts` has shipped under two parquet encodings across fixture
    * generations: TIMESTAMP(NANOS) — which Spark's reader only accepts as a
    * raw nanos BIGINT under spark.sql.legacy.parquet.nanosAsLong=true — and
    * plain TIMESTAMP(MICROS) (no UTC adjustment, so Spark infers
    * TIMESTAMP_NTZ). Dispatch on the type the scan actually produced and
    * normalize both to session-zone TimestampType at microsecond precision,
    * which is exactly what DuckDB yields for either file, so the oracle sees
    * identical values. The nanosAsLong flag is only required when the file
    * really is nanos-encoded; entry points still set it at session build so
    * either fixture generation loads. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventsTs(apply(s, d, "events"))

  /** Normalize a raw `events` scan's `ts` to session-zone TimestampType,
    * whatever encoding the file shipped with. Factored out so per-file
    * loads (e.g. unioning a mixed-encoding directory file-by-file, see
    * SinkSpec) reuse the exact same dispatch. */
  private[graft] def normalizeEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long legacy read: truncate to micros
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => // micros, no UTC adjustment: same wall-clock under UTC session tz
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts read as unsupported type $other; expected BIGINT (nanos), TIMESTAMP_NTZ or TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Register every table as a temp view (entry point B: SQL over views).
    * `events` goes through [[events]] so the SQL surface sees the same
    * microsecond timestamps as the DataFrame surface.
    *
    * Registration is fault-isolated per view: schema resolution is eager in
    * Spark, so one unreadable table (r07: a fixture-format change in
    * `events`) must not take down SQL queries that never touch it. A table
    * that fails to load is skipped (any stale prior registration dropped);
    * queries over it then fail at analysis with TABLE_OR_VIEW_NOT_FOUND
    * while every other view keeps working. Returns the per-table load
    * errors so callers can surface them. */
  def registerViews(spark: SparkSession, sfDir: String): Map[String, Throwable] =
    names.flatMap { n =>
      try {
        val df = if (n == "events") events(spark, sfDir) else apply(spark, sfDir, n)
        df.createOrReplaceTempView(n)
        None
      } catch {
        case e: Exception =>
          spark.catalog.dropTempView(n)
          System.err.println(s"[Tables.registerViews] skipping view '$n': ${e.getMessage}")
          Some(n -> (e: Throwable))
      }
    }.toMap
}
