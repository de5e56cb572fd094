package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

/** X7 spill-safety: the 100 TB posture claims operators survive memory
  * pressure by spilling, not OOMing — this forces the spill paths
  * deterministically (per-operator row-count spill thresholds, not
  * JVM-size roulette) and asserts results are IDENTICAL to the
  * in-memory runs, with task metrics proving the spill actually
  * happened. */
class SpillSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def withConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def spilledBytes(f: => Unit): Long = {
    val spilled = new AtomicLong(0)
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    spark.sparkContext.addSparkListener(l)
    try { f; Thread.sleep(500); spilled.get() }
    finally spark.sparkContext.removeSparkListener(l)
  }

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, SparkTestSession.sf001)
      .collect().map(_.toString).toSeq

  test("window, sort-merge join, and sort queries: identical results under forced spill") {
    val names = Seq("window_running", "window_ranking", "join_left_outer", "sort_multi_key")
    val inMem = names.map(n => n -> rows(n)).toMap
    withConf(
      // row-count spill thresholds: every 64-row buffer hits disk
      "spark.sql.windowExec.buffer.spill.threshold" -> "64",
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "64",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "64",
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "64") {
      var totalSpill = 0L
      names.foreach { n =>
        val got = {
          var r: Seq[String] = null
          totalSpill += spilledBytes { r = rows(n) }
          r
        }
        assert(got == inMem(n), s"$n: spilled run differs from in-memory run")
      }
      assert(totalSpill > 0,
        "no task reported memory/disk spill — thresholds did not engage, test is vacuous")
    }
  }
}
