package graft

import graft.operators.PiiScrub
import org.scalatest.funsuite.AnyFunSuite

/** PII detect/scrub unit tests on constructed rows. */
class PiiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val dirty = Seq(
    (1L, "mail me at jane.doe+spam@corp.example.co or call +44 20 7946 0958 now"),
    (2L, "server at 10.0.0.255 is fine, version 1.2 is not an ip"),
    (3L, "clean text with no pii at all")
  ).toDF("doc_id", "text")

  test("detect counts each PII class") {
    val got = PiiScrub.detect(dirty).as[(Long, Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == ((1L, 1L, 0L)))
    assert(got(2L) == ((0L, 0L, 1L)))
    assert(got(3L) == ((0L, 0L, 0L)))
  }

  test("scrub masks every occurrence and leaves clean text alone") {
    val got = PiiScrub.scrub(dirty).as[(Long, String)].collect().toMap
    assert(got(1L) == "mail me at <EMAIL> or call <PHONE> now")
    assert(got(2L) == "server at <IP> is fine, version 1.2 is not an ip")
    assert(got(3L) == "clean text with no pii at all")
    assert(!got.values.exists(t => t.contains("@") || t.contains("10.0.0.255")))
  }
}
