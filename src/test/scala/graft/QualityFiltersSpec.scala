package graft

import graft.operators.QualityFilters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X22/X23 quality gates: thresholds must BIND (each gate rejects real
  * docs) or the filter is decorative. */
class QualityFiltersSpec extends AnyFunSuite {
  import SparkTestSession._

  test("gopher gates: keep split is non-degenerate and every gate fires") {
    val out = QualityFilters.gopherFilters(
      sources.Tables.documents(spark, sf001)).cache()
    try {
      val n = out.count()
      val kept = out.filter(col("keep")).count()
      assert(kept > 0 && kept < n, s"keep=$kept of $n is degenerate")
      // each gate individually rejects at least one doc on this corpus
      assert(out.filter(col("n_tokens") < 30).count() > 0)
      assert(out.filter(col("mean_word_len") > 5.0).count() > 0)
      assert(out.filter(col("frac_unique") < 0.4).count() > 0)
      assert(out.filter(col("top_token_frac") > 0.15).count() > 0)
      assert(out.filter(col("stopword_hits") < 2).count() > 0)
    } finally out.unpersist()
  }

  test("repetition_signals: gram counts tie to token counts; fractions in [0,1]") {
    val out = SparkEntry.queries("repetition_signals")(spark, sf001).cache()
    try {
      // n_2grams must equal max(ntok-1, 0) — ties the gram explode to
      // the tokenizer the oracle can't cross-check against
      val ntok = sources.Tables.documents(spark, sf001)
        .select(col("doc_id"),
          size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("ntok"))
      val bad = out.join(ntok, "doc_id")
        .filter(col("n_2grams") =!= greatest(col("ntok") - 1, lit(0L))).count()
      assert(bad == 0, s"$bad docs where n_2grams != ntok-1")
      Seq("dup_2gram_frac", "top_2gram_frac", "dup_5gram_frac").foreach { c =>
        assert(out.filter(col(c) < -1e-12 || col(c) > 1 + 1e-12).count() == 0, s"$c out of [0,1]")
      }
      assert(out.filter(col("dup_2gram_frac") > 0).count() > 0,
        "no doc repeats a bigram — dup signal is vacuous on this corpus")
    } finally out.unpersist()
  }

  test("token entropy: 0 <= H <= log2(n_unique), and uniform toy docs hit the bound") {
    val out = QualityFilters.tokenEntropy(
      sources.Tables.documents(spark, sf001)).cache()
    try {
      assert(out.filter(col("entropy") < 0).count() == 0)
      // H is maximized by the uniform distribution at log2(n_unique)
      assert(out.filter(col("entropy") >
        log2(col("n_unique").cast("double")) + 1e-6).count() == 0)
      assert(out.filter(col("entropy") > 0).count() > 0, "all-zero entropy corpus?")
    } finally out.unpersist()
    // exact values on constructed docs: all-same-token => 0 bits;
    // four distinct tokens once each => exactly 2 bits
    import spark.implicits._
    val toy = Seq((1L, "x x x x"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = QualityFilters.tokenEntropy(toy)
      .select("doc_id", "entropy").as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.0 && got(2L) == 2.0, got.toString)
  }

  test("boilerplate fractions are well-formed and detect shared 5-grams") {
    val out = QualityFilters.boilerplate(
      sources.Tables.documents(spark, sf001)).cache()
    try {
      assert(out.filter(col("n_boiler") > col("n_grams")).count() == 0)
      assert(out.filter(col("boiler_frac") < 0 || col("boiler_frac") > 1).count() == 0)
      assert(out.agg(sum(col("n_boiler"))).head().getLong(0) > 0,
        "corpus has shared 5-grams; detector found none")
    } finally out.unpersist()
  }
}
