package graft

import graft.SparkEntry.queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lexicon / experimentation batch: the properties the DuckDB oracle
  * can't see — bounded posting state, spine completeness under empty
  * docs, statistic sanity, and the pointwise-JS nonnegativity law. */
class LexiconSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("inverted_index: postings are the ascending first-k, capped, df binds") {
    val out = queries("inverted_index")(spark, sf001).cache()
    try {
      assert(out.count() > 0)
      // cap: never more than 20 ids; ascending; no term below MinDf
      val bad = out.select(col("term"), split(col("postings"), ",").as("p"), col("df"))
        .filter(size(col("p")) > 20 ||
          col("df") < 5 ||
          // ascending check: sorted form equals stored form
          concat_ws(",", sort_array(transform(col("p"), _.cast("long")))) =!= col("postings"))
        .count()
      assert(bad == 0, s"$bad terms violate cap/order/df invariants")
      // the capped sample is a PREFIX of the full posting list: every
      // term with df <= 20 must carry exactly df ids
      val short = out.filter(col("df") <= 20)
        .filter(size(split(col("postings"), ",")) =!= col("df")).count()
      assert(short == 0, "df<=cap term lost postings")
    } finally out.unpersist()
  }

  test("vocab_oov: full document spine, n_oov <= n_tokens, rate in [0,1]") {
    val out = queries("vocab_oov")(spark, sf001).cache()
    try {
      val nDocs = sources.Tables.documents(spark, sf001).count()
      assert(out.count() == nDocs, "spine must carry every document")
      assert(out.filter(col("n_oov") > col("n_tokens")).count() == 0)
      assert(out.filter(col("oov_rate") < 0 || col("oov_rate") > 1).count() == 0)
      // the top-10 vocab over a 31-word corpus leaves a real OOV tail
      assert(out.filter(col("n_oov") > 0).count() > 0, "vocab covers everything — OOV test is vacuous")
    } finally out.unpersist()
  }

  test("ab_test_welch: counts partition the purchases; t matches a driver-side recompute") {
    val row = queries("ab_test_welch")(spark, sf001).collect().head
    val purchases = sources.Tables.events(spark, sf001)
      .filter(col("event_type") === "purchase").count()
    assert(row.getAs[Long]("n_a") + row.getAs[Long]("n_b") == purchases)
    // recompute t from the reported moments: the published statistic
    // must be consistent with its own published inputs
    val (na, nb) = (row.getAs[Long]("n_a").toDouble, row.getAs[Long]("n_b").toDouble)
    val (ma, mb) = (row.getAs[Double]("mean_a"), row.getAs[Double]("mean_b"))
    val (va, vb) = (row.getAs[Double]("var_a"), row.getAs[Double]("var_b"))
    val t = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert(math.abs(t - row.getAs[Double]("t_welch")) < 1e-3,
      s"t=${row.getAs[Double]("t_welch")} inconsistent with moments ($t)")
    assert(na > 0 && nb > 0, "hash split left a variant empty")
  }

  test("lang_drift_js: per-lang pointwise JS terms are nonnegative and <= ln(2)/2 bound") {
    val out = queries("lang_drift_js")(spark, sf001).cache()
    try {
      // log-sum inequality: 0.5·p·ln(p/m) + 0.5·q·ln(q/m) >= 0 for m=(p+q)/2,
      // and each term is bounded by 0.5·max(p,q)·ln(2)
      assert(out.filter(col("js_term") < -1e-12).count() == 0, "negative JS term")
      assert(out.filter(col("js_term") > 0.5 * math.log(2.0) + 1e-12).count() == 0)
      assert(out.count() > 0)
    } finally out.unpersist()
  }

  test("phrase_match_positional: position-list intersection == n-gram scan count") {
    // the positional-index mechanism must agree with the brute-force
    // bigram scan it replaces, doc for doc
    val got = queries("phrase_match_positional")(spark, sf001)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_occurrences")).toMap
    val want = sources.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        explode(graft.functions.TextFns.ngrams(col("text"), 2)).as("g"))
      .filter(col("g") === "table hash")
      .groupBy("doc_id").count()
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("count")).toMap
    assert(got == want, "positional intersection disagrees with bigram scan")
    assert(got.nonEmpty)
  }

  test("snapshot_diff: statuses partition the key universe with exact add/remove counts") {
    val rows = queries("snapshot_diff")(spark, sf001).collect()
    val byStatus = rows.groupBy(_.getAs[String]("status"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    val orders = sources.Tables.orders(spark, sf001)
    val total = orders.count()
    val added = orders.filter(pmod(col("o_orderkey"), lit(101)) === 0).count()
    val removed = orders.filter(pmod(col("o_orderkey"), lit(13)) === 0).count()
    assert(byStatus("added") == added)
    assert(byStatus("removed") == removed)
    // every key in old ∪ new appears exactly once across statuses
    assert(byStatus.values.sum == total + added)
    assert(byStatus.keySet == Set("added", "removed", "changed", "same"))
    // changed rows carry a non-empty changed-column list; others don't
    rows.foreach { r =>
      val cols = r.getAs[String]("changed_cols")
      if (r.getAs[String]("status") == "changed") assert(cols.nonEmpty)
      else assert(cols.isEmpty, s"${r.getAs[String]("status")} rows must not list columns")
    }
  }

  test("pmi_parts: pmi recomputes from basket counts for the top pair") {
    val out = queries("pmi_parts")(spark, sf0001).collect()
    assert(out.nonEmpty)
    val li = sources.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).distinct().cache()
    try {
      val top = out.head
      val (a, b) = (top.getAs[Long]("part_a"), top.getAs[Long]("part_b"))
      val n = li.select(countDistinct("l_orderkey")).collect().head.getLong(0)
      val ca = li.filter(col("l_partkey") === a).count()
      val cb = li.filter(col("l_partkey") === b).count()
      val cab = li.filter(col("l_partkey") === a).select("l_orderkey")
        .intersect(li.filter(col("l_partkey") === b).select("l_orderkey")).count()
      val pmi = math.log(cab.toDouble * n / (ca.toDouble * cb))
      assert(math.abs(pmi - top.getAs[Double]("pmi")) < 1e-6,
        s"pmi ${top.getAs[Double]("pmi")} != recomputed $pmi")
      assert(cab == top.getAs[Long]("support"))
    } finally li.unpersist()
  }

  test("bpe_pair_counts: 2-char pairs, weighted counts bound word counts, ordered") {
    val out = queries("bpe_pair_counts")(spark, sf001)
      .as[(String, Long, Long)].collect()
    assert(out.nonEmpty && out.length <= 50)
    out.foreach { case (pair, pc, nw) =>
      assert(pair.length == 2, s"pair '$pair' not 2 chars")
      // every contributing word occurs >= once in the corpus, so the
      // freq-weighted occurrence count can never undercut the word count
      assert(pc >= nw && nw >= 1, s"pair '$pair' counts pc=$pc nw=$nw")
    }
    // descending by weighted count with pair tiebreak — the merge-pick order
    val sorted = out.sortBy { case (p, c, _) => (-c, p) }.toSeq
    assert(out.toSeq == sorted)
  }

  test("zipf_fit: one row per lang, slope <= 0 (rank-freq is non-increasing)") {
    val out = queries("zipf_fit")(spark, sf001)
      .as[(String, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._1).distinct.length == out.length)
    out.foreach { case (lang, n, slope) =>
      assert(n >= 2, s"$lang fitted over $n terms")
      // OLS slope of a non-increasing sequence against increasing rank
      // is <= 0 by the Chebyshev sum inequality — a positive slope
      // means the rank window broke ordering
      assert(!slope.isNaN && slope <= 0.0, s"$lang slope $slope")
    }
  }
}
