package graft

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** r07 regression guard: the driver's fixtures have shipped `events.ts` as
  * both parquet TIMESTAMP(NANOS) (r1–r6) and TIMESTAMP(MICROS)/NTZ (r7+),
  * and a loader hard-wired to either encoding takes down every events
  * consumer when the other shows up. Pin that [[Tables.events]] loads BOTH
  * encodings to identical session-zone microsecond timestamps, and that
  * one unreadable table cannot take down SQL queries over the others.
  */
class EventsEncodingSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // Two logical rows; nanos values carry sub-microsecond residue (…789 ns)
  // so the truncation-to-micros contract is actually exercised.
  private val wall = Seq(
    (1L, "2026-03-01 10:00:00.123456", 7L, "click", 1.5, "{}"),
    (2L, "2026-03-02 11:30:05.000001", 8L, "purchase", 9.25, "{}"))
  private val nanosResidue = 789L

  private def utcEpochMicros(s: String): Long = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    val ldt = java.time.LocalDateTime.parse(s, fmt)
    ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000 +
      ldt.getNano / 1000 % 1000
  }

  /** Write `wall` as a single TIMESTAMP(NANOS) parquet file at `file`
    * through the low-level parquet example API — Spark itself cannot
    * write nanos, which is exactly why the legacy read flag exists. */
  private def writeNanosFile(file: String): Unit = {
    val schema = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts (TIMESTAMP(NANOS,false));
        |  required int64 user_id;
        |  required binary event_type (STRING);
        |  required double value;
        |  required binary props (STRING);
        |}""".stripMargin)
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(new org.apache.hadoop.fs.Path(file), conf))
      .withConf(conf)
      .build()
    val fac = new SimpleGroupFactory(schema)
    try wall.foreach { case (id, ts, uid, typ, v, props) =>
      val g = fac.newGroup()
      g.append("event_id", id)
      g.append("ts", utcEpochMicros(ts) * 1000L + nanosResidue)
      g.append("user_id", uid)
      g.append("event_type", typ)
      g.append("value", v)
      g.append("props", props)
      writer.write(g)
    } finally writer.close()
  }

  /** Write `wall` as a Spark-native TIMESTAMP_NTZ(micros) events.parquet
    * directory under `dir` — the r7+ fixture encoding. */
  private def writeMicrosDir(dir: String): Unit =
    wall.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp_ntz(col("ts_s")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def tsStrings(dir: String): Seq[(Long, String)] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType,
      "Tables.events must always hand consumers session-zone TimestampType")
    df.select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
  }

  test("Tables.events loads nanos-encoded and micros-encoded fixtures identically") {
    val nanosDir = Files.createTempDirectory("events-nanos").toString
    writeNanosFile(s"$nanosDir/events.parquet")
    val microsDir = Files.createTempDirectory("events-micros").toString
    writeMicrosDir(microsDir)

    val expected = wall.map { case (id, ts, _, _, _, _) => (id, ts) }
    assert(tsStrings(nanosDir) === expected) // …789 ns residue truncated, not rounded
    assert(tsStrings(microsDir) === expected)

    // r09 verdict task 4: the wrong-unit guard is a load-time probe, not
    // a per-row CASE — the scan plan must carry no raise_error branch in
    // the ts projection (every downstream query would re-pay it per row).
    val plan = Tables.events(spark, nanosDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("raise_error"),
      "ts normalization must not leave a per-row raise_error in the plan")
  }

  test("current driver fixture loads as TimestampType with rows") {
    val df = Tables.events(spark, SparkTestSession.sf0001)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(1).count() === 1)
  }

  test("time-column normalization covers every table's event-time columns") {
    // the dispatch is table-generic (r08): orders/lineitem date columns
    // get the same treatment as events.ts, so a future regen flipping
    // THEIR encoding cannot repeat the r07 breakage
    assert(Tables.orders(spark, SparkTestSession.sf0001)
      .schema("o_orderdate").dataType === TimestampType)
    assert(Tables.lineitem(spark, SparkTestSession.sf0001)
      .schema("l_shipdate").dataType === TimestampType)
    // DATE-typed branch: a date-encoded regen loads as midnight timestamps
    val dir = Files.createTempDirectory("orders-date").toString
    spark.sql("SELECT 1L AS o_orderkey, DATE'2026-03-05' AS o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val viaDate = Tables.orders(spark, dir)
    assert(viaDate.schema("o_orderdate").dataType === TimestampType)
    assert(viaDate.select(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
      .as[String].head() === "2026-03-05 00:00:00")
  }

  test("registerViews isolates one unreadable table from the rest of the SQL surface") {
    val dir = Files.createTempDirectory("views-isolated")
    Tables.names.filterNot(_ == "events").foreach { n =>
      Files.createSymbolicLink(
        dir.resolve(s"$n.parquet"),
        Paths.get(s"${SparkTestSession.sf0001}/$n.parquet"))
    }
    // events.parquet exists but is not parquet — schema resolution throws
    Files.write(dir.resolve("events.parquet"), "not a parquet file".getBytes)

    val errs = Tables.registerViews(spark, dir.toString)
    try {
      assert(errs.keySet === Set("events"), s"expected only events to fail, got $errs")
      // queries that never touch events keep working…
      assert(spark.sql("SELECT count(*) AS n FROM orders").as[Long].head() > 0)
      // …and events itself fails at analysis (view absent), not at registration
      val e = intercept[Exception](spark.sql("SELECT * FROM events").collect())
      assert(e.getMessage.toLowerCase.contains("table or view"),
        s"expected TABLE_OR_VIEW_NOT_FOUND, got: ${e.getMessage.take(200)}")
    } finally Tables.registerViews(spark, SparkTestSession.sf0001) // restore for sibling suites
  }

  test("mixed-encoding directory: merged read rejected, per-file adaptive union works") {
    val dir = Files.createTempDirectory("events-mixed").toString
    writeNanosFile(s"$dir/part-nanos.parquet")
    val microsStage = Files.createTempDirectory("events-mixed-stage").toString
    writeMicrosDir(microsStage)
    val microsPart = {
      import scala.jdk.CollectionConverters._
      Files.list(Paths.get(s"$microsStage/events.parquet")).iterator().asScala
        .find(p => p.getFileName.toString.startsWith("part-") &&
          p.getFileName.toString.endsWith(".parquet")).get
    }
    Files.copy(microsPart, Paths.get(s"$dir/part-micros.parquet"))

    // Documented rejection: one directory mixing INT64-nanos-as-long and
    // TIMESTAMP_NTZ files cannot be read as one schema — schema merge has
    // no common type for ts. The engine's contract is per-file normalize
    // then union, below.
    intercept[Throwable] {
      spark.read.option("mergeSchema", "true").parquet(dir).collect()
    }

    val unioned = Tables
      .normalizeEventsTs(spark.read.parquet(s"$dir/part-nanos.parquet"))
      .unionByName(Tables.normalizeEventsTs(spark.read.parquet(s"$dir/part-micros.parquet")))
    val got = unioned
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[(Long, String)].collect().toSeq.sorted
    val expected = wall.map { case (id, ts, _, _, _, _) => (id, ts) }
    assert(got === (expected ++ expected).sorted)
  }

  test("wrong-unit int64 time column fails loudly, not as silently shifted timestamps") {
    // r08 advice: the long branch assumed nanos unconditionally, so a
    // micros-as-long (or seconds-as-long) regen would divide every value
    // by 1000 and shift all timestamps 1000x with no error. Pin the
    // plausibility guard: after /1000 the min/max must land in
    // [1990,2100) as a micros epoch, checked once at loader build via a
    // footer-stats min/max probe (r09: hoisted out of the per-row path).
    val schema = MessageTypeParser.parseMessageType(
      """message events {
        |  required int64 event_id;
        |  required int64 ts;
        |  required int64 user_id;
        |  required binary event_type (STRING);
        |  required double value;
        |  required binary props (STRING);
        |}""".stripMargin)
    val dir = Files.createTempDirectory("events-micros-as-long").toString
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$dir/events.parquet"), conf))
      .withConf(conf)
      .build()
    val fac = new SimpleGroupFactory(schema)
    try wall.foreach { case (id, ts, uid, typ, v, props) =>
      val g = fac.newGroup()
      g.append("event_id", id)
      g.append("ts", utcEpochMicros(ts)) // micros stored where nanos belong
      g.append("user_id", uid)
      g.append("event_type", typ)
      g.append("value", v)
      g.append("props", props)
      writer.write(g)
    } finally writer.close()

    val e = intercept[Throwable] {
      Tables.events(spark, dir).select("ts").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("not a nanos epoch")),
      s"expected the wrong-unit guard to fire, got: ${e.getMessage}")
  }

  test("wrong-unit probe is answered from parquet footer statistics (PushedAggregation)") {
    // r10 verdict: the probe's "metadata-only" scaladoc claim was
    // unverified — probeMinMax now scopes the DSv2 + aggregatePushdown
    // confs itself (same pattern as G31). Pin that the pushdown rule
    // really accepts a TIMESTAMP(NANOS)-annotated int64 read as long:
    // the probe plan must carry PushedAggregation, i.e. no data pages.
    val dir = Files.createTempDirectory("events-nanos-probe").toString
    writeNanosFile(s"$dir/events.parquet")
    val files = spark.read.parquet(s"$dir/events.parquet").inputFiles.toSeq
    SparkTestSession.withConf(
      "spark.sql.sources.useV1SourceList" -> "",
      "spark.sql.parquet.aggregatePushdown" -> "true") {
      val plan = Tables.probePlanForSpec(spark, files, "ts")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [MIN(ts), MAX(ts)]"),
        s"probe min/max must be served from footer stats, plan was:\n${plan.take(1500)}")
    }
  }

  test("streaming ingest over a nanos-encoded fixture works (per-row guard, no batch probe)") {
    // r10 ADVICE (high): normalizeTs's batch min/max probe is an eager
    // action and threw 'Queries with streaming sources must be executed
    // with writeStream.start()' when the streaming path hit the LongType
    // branch — exactly the nanos-fixture-regen case the guard exists
    // for. The streaming branch now keeps the per-row CASE+raise_error.
    val dir = Files.createTempDirectory("events-stream-nanos").toString
    writeNanosFile(s"$dir/events.parquet")
    val stream = graft.streaming.StreamingOps.readEventsStream(spark, dir.toString)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType === TimestampType)
    val q = stream
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"))
      .writeStream.format("memory").queryName("nanos_stream_probe")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("nanos_stream_probe")
        .as[(Long, String)].collect().toSeq.sortBy(_._1)
      assert(got === wall.map { case (id, ts, _, _, _, _) => (id, ts) })
    } finally q.stop()
  }

  test("readEventsStream on an empty directory defines with the declared default schema") {
    // r08 advice: the schema probe made stream definition throw when no
    // file had landed yet — the production ingest shape the doc comment
    // advertises. Pin the declared-schema fallback: definition succeeds,
    // and the surfaced schema matches the batch loader's (normalized ts).
    val dir = Files.createTempDirectory("events-stream-empty").toString
    val stream = graft.streaming.StreamingOps.readEventsStream(spark, dir)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType === TimestampType)
    assert(stream.schema.fieldNames.toSeq ===
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
  }
}
