ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hadoopmapreducespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked `run`/`runMain` stdout lands UNDECORATED (r16 VERDICT task 2,
// root-caused from BENCH_r16.json's literal tail bytes): sbt's default
// LoggedOutput prefixes every forked-run line with "[info] ", so the
// driver's BENCH_r{N}.json tail-parse — which needs a bare JSON line —
// returned null for 16 straight rounds even once the compact metric
// line fit the 2000-char window. StdoutOutput pipes the forked JVM's
// stdout/stderr straight through. Scoped to the run task only (runMain
// shares run's runner, verified by sbt's own lintUnused on a
// runMain-scoped copy + the StdoutProbe main): Test delegates
// Test→Runtime→Compile, and test output should keep its [info]
// framing. Pinned (with the literal r16 tail as fixture) in
// tools/test_bench_guard.py.
Compile / run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// THE add-a-query step (r9 verdict task 6, shipped r11): `sbt addQueryCheck`
// after any registry change. Regenerates the README query cross-index from
// source, then runs the two artifact-coverage suites — ReadmeIndexSpec
// (index ≡ live registry, anchors live) and BenchCanonSpec (BENCH_CANON.json
// covers the registry exactly). A new query that skipped the canon refresh
// fails here with the refresh command in the message; the same suites run
// under plain `sbt test`, so skipping this task cannot ship green either —
// this task exists so the regeneration half is one command, not tribal
// knowledge.
lazy val addQueryCheck = taskKey[Unit](
  "Regenerate README query index, then verify index + bench-canon coverage")
addQueryCheck := Def.sequential(
  Def.task {
    val log = streams.value.log
    val rc = scala.sys.process.Process(
      Seq("python3", "tools/readme_index.py"), baseDirectory.value).!
    if (rc != 0) sys.error(s"tools/readme_index.py exited $rc")
    log.info("README query index regenerated; verifying coverage suites…")
  },
  (Test / testOnly).toTask(" graft.ReadmeIndexSpec graft.BenchCanonSpec")
).value
