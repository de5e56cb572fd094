package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query at
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line.
  *
  * Protocol (hardened round 4; resharded round 7):
  *   1. WARM EVERY TABLE — one full noop scan per driver table before
  *      any timing. One-time session costs (parquet footer reads,
  *      vectorized reader init, first-codegen) otherwise land on
  *      whichever query first touches a table: under byte-identical
  *      code the same ~10 s landed on `agg_pricing_summary` in round 2
  *      and `multimodal_join` in round 3. Build-once index artifacts
  *      (graft.Indexes) also materialize during warmup — BASELINE.md
  *      and the protocol object both disclose that timed medians
  *      exclude index-build cost.
  *   2. MEDIAN OF 3 RUNS per query after one untimed run (whole-stage
  *      codegen for the query's own plan compiles on first execution) —
  *      a single-run figure cannot distinguish a real regression from
  *      the 3–8× run-to-run noise measured across rounds 2–3.
  *   3. FRESH JVM PER SHARD (VERDICT r06 task 2): one long-lived JVM
  *      executing 190 queries × 4 runs degrades late in the run
  *      (accumulated broadcasts/listener/codegen state → GC pressure),
  *      inflating the last deciles 2–13× — the round-6 artifact
  *      published `tpch_q18ish` at 14.44 s vs 1.57 s measured in a
  *      fresh JVM. The parent process forks one child JVM per
  *      contiguous slice of the sorted query list (default 8 shards,
  *      `SPARK_GRAFT_BENCH_SHARDS` to override), sequentially so shards
  *      never contend for cores; children return per-run times, the
  *      parent merges. Shard warmups re-read tables but ADOPT the
  *      persisted index artifacts built by earlier shards
  *      (Indexes cross-JVM adoption), so repeated warmup stays cheap.
  *      If forking is unavailable the parent falls back to running
  *      each shard in-process on a freshly restarted SparkContext —
  *      weaker hygiene (one OS process) but the same broadcast/
  *      listener/codegen-cache reset.
  *
  * stdout carries the driver contract line (per-query MEDIANS — past
  * rounds saw stdout truncation on oversized lines, so run arrays stay
  * out of it); the complete per-query min/median/max + raw runs go to
  * the self-published BENCH_SELF_r{N}.json.
  */
object Bench {
  private val Reps = 3

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // pinned TZ: date-bucketing queries must do the same work (same
      // day boundaries, row counts) regardless of the machine's zone —
      // and it matches Verify/TimeQ, keeping timings comparable
      .config("spark.sql.session.timeZone", "UTC")
      // NOT dead config on micros fixtures (it is a no-op there): this flag
      // is what makes a TIMESTAMP(NANOS) fixture regen READABLE at all —
      // Spark 4 otherwise rejects the parquet type, while with the flag it
      // reads as int64 and Tables.normalizeTs routes it adaptively.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Sorted-name query list — parent and children derive the shard
    * slices from this same ordering, so no name list crosses the
    * process boundary (shard forks inherit the parent's environment,
    * so the optional filter below agrees across the boundary too).
    *
    * SPARK_GRAFT_BENCH_QUERIES (comma-separated names) restricts the
    * set — used by the 100× spot-stress, where the declared pair
    * emitters (see tools/scale_growth.py KNOWN_SUPERLINEAR) would
    * produce output quadratic in the replica count and are excluded
    * rather than silently timed out. Unknown names fail fast so a
    * typo'd filter can't publish a silently-short artifact. */
  private def sortedQueries = {
    val base = SparkEntry.queries.toSeq.sortBy(_._1)
    sys.env.get("SPARK_GRAFT_BENCH_QUERIES").map(_.trim).filter(_.nonEmpty) match {
      case Some(sel) =>
        val names = sel.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val missing = names.diff(base.map(_._1).toSet)
        require(missing.isEmpty,
          s"unknown queries in SPARK_GRAFT_BENCH_QUERIES: ${missing.toSeq.sorted.mkString(", ")}")
        base.filter(q => names(q._1))
      case None => base
    }
  }

  private def shardSlice(i: Int, n: Int): Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = {
    val qs = sortedQueries
    val per = (qs.size + n - 1) / n
    qs.slice(i * per, math.min(qs.size, (i + 1) * per))
  }

  /** Generic execution-stack warmup: a fresh JVM's first timed queries
    * otherwise pay the C2-JIT tax on Spark's shuffle/agg/join/window/
    * sort machinery — the per-query untimed run compiles the QUERY's
    * codegen but not the interpreter-tier runtime under it. Measured on
    * the first sharded run: 11 of 14 round-over-round flags sat at
    * shard offsets 0–3 (ab_test_welch 0.59→1.09 s etc.). Three reps of
    * a synthetic range→agg→join→window→sort pipeline push those paths
    * through C2 before any timing. */
  private def jitWarm(spark: SparkSession): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    (1 to 3).foreach { _ =>
      val base = spark.range(1 << 20).selectExpr("id", "id % 997 AS k",
        "CAST(id % 7919 AS DOUBLE) AS v", "concat('s', id % 1013) AS s")
      val agg = base.groupBy("k")
        .agg(sum("v").as("sv"), count(lit(1)).as("c"),
          approx_count_distinct("s").as("d"))
      base.join(agg, "k")
        .withColumn("r", row_number().over(
          Window.partitionBy("k").orderBy(col("v").desc, col("id"))))
        .filter(col("r") <= 3)
        .orderBy(col("sv").desc, col("id"))
        .write.format("noop").mode("overwrite").save()
    }
  }

  /** Warm tables, then time each query: one untimed run + Reps timed.
    * Failed runs record -1 (never a plausible-looking time). */
  private def timeQueries(spark: SparkSession, sfDir: String,
                          qs: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)])
  : Seq[(String, Seq[Double])] = {
    graft.sources.Tables.names.foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $t failed: ${e.getMessage}")
      }
    }
    try jitWarm(spark)
    catch { case e: Throwable =>
      System.err.println(s"[bench] jit warmup failed (non-fatal): ${e.getMessage}")
    }
    qs.map { case (name, fn) =>
      // untimed first run: this query's whole-stage codegen compiles
      // here, and any index artifact it reads builds/adopts here
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () } // timed runs below report it
      val times = Seq.fill(Reps) {
        val t0 = System.nanoTime()
        // noop sink: fully materializes every row and column (sorts
        // run, scalar columns evaluate) with zero serialization/disk
        // cost. A bare count() would let Catalyst eliminate top-level
        // ORDER BYs and prune all computed columns — under-measuring.
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      }
      System.err.println(f"[bench] $name%-32s runs=" +
        times.map(t => f"$t%.3f").mkString("[", ", ", "]"))
      name -> times
    }
  }

  /** Child entry: time shard `i` of `n`, write `name\tt1,t2,t3` lines. */
  private def shardMain(i: Int, n: Int, out: String): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session()
    val rows = timeQueries(spark, sfDir, shardSlice(i, n))
    val text = rows.map { case (name, ts) =>
      name + "\t" + ts.map(t => f"$t%.6f").mkString(",")
    }.mkString("", "\n", "\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out), text.getBytes("UTF-8"))
    spark.stop()
  }

  // same list as build.sbt / spark-submit's JavaModuleOptions: Spark 4
  // on JDK 17 needs these opens in every child JVM
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Fork one fresh JVM for shard i/n; forward its output to stderr
    * (parent stdout is reserved for the driver contract line). Returns
    * None if the fork path is unusable (missing java, bad classpath…) —
    * caller falls back to in-process. */
  private def forkShard(i: Int, n: Int): Option[Seq[(String, Seq[Double])]] = {
    val out = java.nio.file.Files.createTempFile(s"graft_bench_$i", ".tsv")
    try {
      val javaBin = java.nio.file.Paths.get(
        System.getProperty("java.home"), "bin", "java").toString
      val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
      val cmd: Seq[String] = Seq(javaBin, s"-Xmx$mem") ++ addOpens ++ Seq(
        "-cp", System.getProperty("java.class.path"),
        "graft.Bench", "--shard", i.toString, n.toString, out.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val gobbler = new Thread(() => {
        val r = new java.io.BufferedReader(
          new java.io.InputStreamReader(p.getInputStream, "UTF-8"))
        var l = r.readLine()
        while (l != null) { System.err.println(l); l = r.readLine() }
      })
      gobbler.setDaemon(true)
      gobbler.start()
      val code = p.waitFor()
      gobbler.join(5000)
      if (code != 0) { System.err.println(s"[bench] shard $i exited $code"); None }
      else {
        import scala.jdk.CollectionConverters._
        val rows = java.nio.file.Files.readAllLines(out).asScala.toSeq
          .filter(_.nonEmpty).map { l =>
            val Array(name, ts) = l.split("\t")
            name -> ts.split(",").map(_.toDouble).toSeq
          }
        if (rows.isEmpty) { System.err.println(s"[bench] shard $i returned no rows"); None }
        else Some(rows)
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] fork shard $i failed: ${e.getMessage}")
      None
    } finally java.nio.file.Files.deleteIfExists(out)
  }

  /** In-process fallback: fresh SparkContext per shard — stop() drops
    * broadcasts, the listener bus, and the block manager; getOrCreate
    * then builds a genuinely new context. */
  private def inProcessShard(i: Int, n: Int, sfDir: String): Seq[(String, Seq[Double])] = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = session()
    try timeQueries(spark, sfDir, shardSlice(i, n))
    finally spark.stop()
  }

  def main(args: Array[String]): Unit = args match {
    case Array("--shard", i, n, out) => shardMain(i.toInt, n.toInt, out)
    case _ => parentMain()
  }

  private def parentMain(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nQueries = sortedQueries.size
    val shards = math.max(1, math.min(nQueries,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_SHARDS", "8").toInt))

    var forked = true
    val perQuery: Seq[(String, Seq[Double])] = (0 until shards).flatMap { i =>
      System.err.println(s"[bench] === shard $i/$shards ===")
      forkShard(i, shards) match {
        case Some(rows) => rows
        case None =>
          forked = false
          inProcessShard(i, shards, sfDir)
      }
    }

    // median over SUCCESSFUL runs only: sorting -1s into the pick
    // would make one intermittent failure report min(successes) — a
    // flaky query would bench as healthy-and-faster. All-failed → -1.
    def stats(ts: Seq[Double]): (Double, Double, Double) = {
      val ok = ts.filter(_ >= 0).sorted
      if (ok.isEmpty) (-1.0, -1.0, -1.0)
      else (ok(ok.size / 2), ok.head, ok.last)
    }
    def r3(x: Double) = math.rint(x * 1000) / 1000
    val results = perQuery.map { case (n, ts) => (n, stats(ts), ts) }

    val qs = results.map { case (k, (med, _, _), _) => s"\"" + k + "\":" + r3(med) }
      .mkString("{", ",", "}")
    val total = r3(results.map(_._2._1).sum)
    // n_queries rides along so the total can be normalized across
    // rounds: the registry grows every round, and a raw total compared
    // against a fixed-size baseline silently penalizes added coverage.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_queries":${results.size},"sf":"$sfDir"}""")

    // Self-published artifact (VERDICT r04 task 3): the driver's stdout
    // capture has truncated the per-query map mid-JSON in past rounds,
    // so the COMPLETE machine-readable result — including per-run
    // spreads (VERDICT r06 task 2) — is written to the repo as
    // BENCH_SELF_r{N}.json, N inferred as one past the newest
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
      // headline stays the median total (driver contract), but the
      // min-of-reps total rides along: medians absorb co-tenant load
      // spikes (r08 published doc_quality at a 4.09 s median over runs
      // [4.13, 4.09, 1.12]), so the regression guard keys on per-query
      // min (tools/bench_guard.py) and BASELINE.md records both.
      val totalMin = r3(results.map(_._2._2).filter(_ >= 0).sum)
      // Publish-time contention detection (VERDICT r10 task 3): the r07,
      // r09 and r10 driver artifacts were all distorted by co-tenant
      // load, visible as many-query within-shard run spreads no plan
      // change can produce (e.g. join_left_outer [7.35, 2.36, 6.72]).
      // Calibrated on those artifacts: ≥5 queries with max/min > 3× and
      // max ≥ 0.45 s flags every known contended run (8, 20 hits) and no
      // known clean run (0–3 hits). The stamp rides in the artifact so
      // tools/bench_guard.py can warn and quarantine without a rename.
      val spread3x = results.count { case (_, (_, mn, mx), _) =>
        mn > 0 && mx >= 0.45 && mx / mn > 3.0
      }
      val contended = spread3x >= 5
      if (contended) System.err.println(
        s"[bench] WARNING: $spread3x queries show >3x within-shard run spread — " +
          "machine contention signature; artifact stamped \"contended\":true")
      val protocol = s"""{"reps":$Reps,"aggregation":"median_of_successful",""" +
        s""""regression_guard":"per-query min (tools/bench_guard.py)",""" +
        s""""warmup":"per shard: all tables noop-scanned + 3 synthetic JIT pipeline runs, then 1 untimed run per query",""" +
        s""""indexes":"persisted across queries and shards; build cost falls in warmup",""" +
        s""""shards":$shards,"isolation":"${if (forked) "fresh JVM per shard" else "fresh SparkContext per shard (fork unavailable)"}",""" +
        s""""cpus":"${esc(cpus)}","spark":"${esc(org.apache.spark.SPARK_VERSION)}","sink":"noop"}"""
      val detail = results.map { case (k, (med, mn, mx), ts) =>
        "\"" + k + "\":{\"median\":" + r3(med) + ",\"min\":" + r3(mn) +
          ",\"max\":" + r3(mx) + ",\"runs\":[" + ts.map(r3).mkString(",") + "]}"
      }.mkString("{", ",", "}")
      java.nio.file.Files.write(out,
        s"""{"metric":"total","value":$total,"value_min":$totalMin,"unit":"sec","n_queries":${results.size},"contended":$contended,"n_spread3x":$spread3x,"sf":"${esc(sfDir)}","protocol":$protocol,"queries":$qs,"query_detail":$detail}""".getBytes("UTF-8"))
      System.err.println(s"[bench] self-published $out")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] self-publish failed (non-fatal): ${e.getMessage}")
    }
  }
}
