package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-prep tests: chunking covers every token with the declared
  * overlap, and the contamination screen is exact on a planted case.
  * (Oracle parity for both queries is the driver's DuckDB gate; these
  * pin the semantic properties the SQL compare can't express.)
  */
class TrainingPrepSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = SparkTestSession.sf001

  lazy val chunks =
    SparkEntry.queries("training_chunks")(spark, sf)
      .as[(Long, Long, Long, String)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

  lazy val toks = sources.Tables.documents(spark, sf)
    .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")).as("t"))
    .as[(Long, Seq[String])].collect().toMap

  test("every document with tokens is chunked; reconstruction covers all tokens in order") {
    val nonEmpty = toks.filter(_._2.nonEmpty)
    assert(chunks.keySet == nonEmpty.keySet)
    chunks.foreach { case (doc, cs) =>
      // chunk i starts at token i*24 (0-based) and takes up to 32 tokens
      cs.foreach { case (_, i, nTok, text) =>
        val expect = toks(doc).slice((i * 24).toInt, (i * 24).toInt + 32)
        assert(text == expect.mkString(" "), s"doc $doc chunk $i")
        assert(nTok == expect.size)
      }
      // indices are 0..k-1; every chunk before the last is full-size;
      // consecutive chunks overlap by exactly 8 tokens; union covers all
      assert(cs.map(_._2) == cs.indices.map(_.toLong))
      assert(cs.init.forall(_._3 == 32))
      val n = toks(doc).size
      val last = cs.last
      assert(last._2 * 24 + last._3 == n, s"doc $doc: last chunk must end at token $n")
    }
  }

  test("chunk-count formula: 1 if n<=32 else ceil((n-32)/24)+1") {
    chunks.foreach { case (doc, cs) =>
      val n = toks(doc).size
      val want = if (n <= 32) 1 else ((n - 32) + 23) / 24 + 1
      assert(cs.size == want, s"doc $doc n=$n")
    }
  }

  test("contamination screen: planted eval duplicate scores 1.0, disjoint doc scores 0") {
    // doc 0 (eval: 0 % 97 == 0) vs a train doc repeating its text and a
    // disjoint train doc — computed through the same operator bodies on
    // a tiny literal table to pin exact fractions.
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // eval
      (1L, "alpha beta gamma delta epsilon zeta"), // fully contained
      (2L, "one two three four five six")          // disjoint
    ).toDF("doc_id", "text")
    val out = {
      val grams = docs.select(col("doc_id"),
        explode(graft.functions.TextFns.ngrams(col("text"), 3)).as("gram"))
      val ev = grams.filter(col("doc_id") % 97 === 0)
        .select(col("gram").as("eval_gram")).distinct()
      val tr = grams.filter(col("doc_id") % 97 =!= 0).distinct()
      tr.join(broadcast(ev), col("gram") === col("eval_gram"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"), count(col("eval_gram")).as("n_hit"))
        .select(col("doc_id"), round(col("n_hit").cast("double") / col("n_grams"), 6).as("c"))
        .as[(Long, Double)].collect().toMap
    }
    assert(out(1L) == 1.0 && out(2L) == 0.0)
  }

  test("packGreedy: boundary fit, overflow split, oversized doc isolated") {
    // budget 10; docs in id order with sizes 4,6,1,25,2,9,10:
    //   bin 0: 4+6 = 10 (exact fit — the boundary is inclusive)
    //   bin 1: 1 (adding 25 would overflow)
    //   bin 2: 25 alone (oversized doc owns its bin)
    //   bin 3: 2 (2+9 > 10), bin 4: 9 (9+10 > 10), bin 5: 10
    val docs = Seq((1L, 4L), (2L, 6L), (3L, 1L), (4L, 25L), (5L, 2L),
      (6L, 9L), (7L, 10L))
      .toDF("doc_id", "n_tok").withColumn("g", lit("a"))
    val got = graft.operators.TrainingPrep.packGreedy(docs, 10, Seq("g"))
      .orderBy("doc_id").select("doc_id", "bin")
      .as[(Long, Int)].collect().toSeq
    assert(got == Seq(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 2, 5L -> 3,
      6L -> 4, 7L -> 5))
    // zero-token doc leading the group: the empty bin 0 must absorb the
    // following oversized doc, not burn a bin number (the fill > 0
    // guard — mirrored by the oracle's recursive step)
    val zlead = Seq((1L, 0L), (2L, 25L), (3L, 3L))
      .toDF("doc_id", "n_tok").withColumn("g", lit("a"))
    val gotZ = graft.operators.TrainingPrep.packGreedy(zlead, 10, Seq("g"))
      .orderBy("doc_id").select("doc_id", "bin")
      .as[(Long, Int)].collect().toSeq
    assert(gotZ == Seq(1L -> 0, 2L -> 0, 3L -> 1))
  }

  test("packGreedy invariants on the corpus: coverage, monotone bins, no overflow") {
    val docs = sources.Tables.documents(spark, SparkTestSession.sf0001)
      .select(col("lang"), pmod(col("doc_id"), lit(16)).as("shard"),
        col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tok"))
    val packed = graft.operators.TrainingPrep
      .packGreedy(docs, 512, Seq("lang", "shard")).cache()
    try {
      assert(packed.count() == docs.count(), "every doc packed exactly once")
      // no bin over budget unless it is a single oversized doc
      val bad = packed.groupBy("lang", "shard", "bin")
        .agg(sum(col("n_tok")).as("tot"), count(lit(1)).as("k"))
        .filter(col("tot") > 512 && col("k") > 1).count()
      assert(bad == 0L, "multi-doc bin over budget")
      // bins are 0-based and contiguous per group
      val gaps = packed.groupBy("lang", "shard")
        .agg(min(col("bin")).as("lo"), max(col("bin")).as("hi"),
          countDistinct(col("bin")).as("k"))
        .filter(col("lo") =!= 0 || col("k") =!= col("hi") + 1).count()
      assert(gaps == 0L, "bins must be contiguous from 0")
    } finally packed.unpersist()
  }
}
