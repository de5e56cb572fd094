package graft

import graft.functions.TextFns
import graft.operators.TextPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-fidelity golden tests (reference/report.md:77-90) plus n-gram
  * invariants (SURVEY.md §5.2). */
class NgramSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val clam = "How can a clam cram in a clean cream can?"

  test("golden: clam/cram trigrams match reference/report.md:77-90 exactly") {
    val got = TextPipeline.ngramCount(Seq(clam).toDF("text"), "text", 3)
      .as[(String, Long)].collect().toSeq
    val want = Seq(
      "a clam cram", "a clean cream", "can a clam", "clam cram in",
      "clean cream can", "cram in a", "how can a", "in a clean"
    ).map(_ -> 1L)
    assert(got == want)
  }

  test("n=1 fast path: word counts") {
    val got = TextPipeline.ngramCount(Seq(clam).toDF("text"), "text", 1)
      .as[(String, Long)].collect().toMap
    assert(got("a") == 2L && got("can") == 2L && got("clam") == 1L)
    assert(got.values.sum == 10L) // 10 tokens
  }

  test("document with fewer than n tokens yields nothing") {
    val got = TextPipeline.ngramCount(Seq("just two").toDF("text"), "text", 3)
    assert(got.count() == 0)
  }

  test("n=5 and n=6 window counts = max(0, tokens - n + 1)") {
    for (n <- Seq(5, 6)) {
      val cnt = TextPipeline.ngramCount(Seq(clam).toDF("text"), "text", n)
        .agg(sum("cnt")).as[Long].head()
      assert(cnt == 10 - n + 1, s"n=$n")
    }
  }

  test("normalization strips punctuation and lowercases; empty tokens dropped") {
    val toks = Seq("  Héllo,, WORLD!!  it's 42  ")
      .toDF("s").select(TextFns.tokens($"s")).as[Seq[String]].head()
    // é is stripped (non-ASCII-alnum), apostrophe removed joining "it's"→"its"
    assert(toks == Seq("hllo", "world", "its", "42"))
  }

  test("ngram invariant on real documents: total windows = sum(max(0, n_tok - 2))") {
    val docs = sources.Tables.documents(spark, SparkTestSession.sf0001)
    val expected = docs
      .select(greatest(lit(0), size(TextFns.tokens($"text")) - 2).as("w"))
      .agg(sum("w")).as[Long].head()
    val got = TextPipeline.ngramCount(docs, "text", 3)
      .agg(sum("cnt")).as[Long].head()
    assert(got == expected)
  }
}
