package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query at
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line.
  *
  * Protocol (hardened in round 4 after rounds 2–3 proved the naive form
  * untrustworthy):
  *   1. WARM EVERY TABLE — one full noop scan per driver table before any
  *      timing. One-time session costs (parquet footer reads, vectorized
  *      reader init, first-codegen) otherwise land on whichever query
  *      first touches a table: under byte-identical code the same ~10 s
  *      landed on `agg_pricing_summary` in round 2 and `multimodal_join`
  *      in round 3.
  *   2. MEDIAN OF 3 RUNS per query, queries in sorted-name order — a
  *      single-run figure cannot distinguish a real regression from the
  *      3–8× run-to-run noise measured across rounds 2–3. Per-run times
  *      go to stderr for drill-down; the JSON carries the medians.
  */
object Bench {
  private val Reps = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // pinned TZ: date-bucketing queries must do the same work (same
      // day boundaries, row counts) regardless of the machine's zone —
      // and it matches Verify/TimeQ, keeping timings comparable
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    graft.sources.Tables.names.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $t failed: ${e.getMessage}")
      }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // One untimed execution first: whole-stage codegen for THIS query's
      // plan compiles on first run (table warmup can't reach it) — without
      // this, run 1 reads ~2-4x slower than runs 2-3 on otherwise-stable
      // queries and the per-run spread looks like noise it isn't.
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () } // timed runs below report it
      val times = Seq.fill(Reps) {
        val t0 = System.nanoTime()
        // noop sink: fully materializes every row and column (sorts run,
        // scalar columns evaluate) with zero serialization/disk cost.
        // A bare count() would let Catalyst eliminate top-level ORDER BYs
        // and prune all computed columns — under-measuring the query.
        // A throwing run records -1 (never a plausible-looking time).
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      }
      // median over SUCCESSFUL runs only: sorting -1s into the pick
      // would make one intermittent failure report min(successes) — a
      // flaky query would bench as healthy-and-faster. All-failed → -1.
      val ok = times.filter(_ >= 0).sorted
      val median = if (ok.isEmpty) -1.0 else ok(ok.size / 2)
      System.err.println(f"[bench] $name%-32s median=$median%8.3f  runs=" +
        times.map(t => f"$t%.3f").mkString("[", ", ", "]"))
      name -> math.rint(median * 1000) / 1000
    }

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = math.rint(results.map(_._2).sum * 1000) / 1000
    // n_queries rides along so the total can be normalized across
    // rounds: the registry grows every round, and a raw total compared
    // against a fixed-size baseline silently penalizes added coverage.
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_queries":${results.size},"sf":"$sfDir"}"""
    println(line)

    // Self-published artifact (VERDICT r04 task 3): the driver's stdout
    // capture has truncated the per-query map mid-JSON in past rounds,
    // so the COMPLETE machine-readable result is also written to the
    // repo as BENCH_SELF_r{N}.json — N inferred as one past the newest
    // driver-written BENCH_r{N}.json, overridable via GRAFT_BENCH_OUT.
    try {
      val out = sys.env.get("GRAFT_BENCH_OUT").map(java.nio.file.Paths.get(_))
        .getOrElse {
          val cwd = java.nio.file.Paths.get(".").toAbsolutePath
          val re = "BENCH_r(\\d+)\\.json".r
          val stream = java.nio.file.Files.list(cwd)
          val n = try {
            val it = stream.iterator()
            var m = 0
            while (it.hasNext) it.next().getFileName.toString match {
              case re(d) => m = math.max(m, d.toInt)
              case _ =>
            }
            m
          } finally stream.close() // Files.list holds the dir fd open
          cwd.resolve(f"BENCH_SELF_r${n + 1}%02d.json")
        }
      // env-derived strings must be JSON-escaped or a quote in
      // SPARK_GRAFT_CPUS corrupts the machine-readable artifact
      def esc(x: String) = x.replace("\\", "\\\\").replace("\"", "\\\"")
      val protocol = s"""{"reps":$Reps,"aggregation":"median_of_successful",""" +
        s""""warmup":"all tables noop-scanned, then 1 untimed run per query",""" +
        s""""cpus":"${esc(cpus)}","spark":"${esc(spark.version)}","sink":"noop"}"""
      java.nio.file.Files.write(out,
        s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"sf":"${esc(sfDir)}","protocol":$protocol,"queries":$qs}""".getBytes("UTF-8"))
      System.err.println(s"[bench] self-published $out")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] self-publish failed (non-fatal): ${e.getMessage}")
    }
    spark.stop()
  }
}
