package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X20 sampling/split tests: determinism (the property df.sample lacks),
  * stratum caps, and split fraction sanity. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val docs = sources.Tables.documents(spark, SparkTestSession.sf001)

  test("stratified cap: <= N per stratum, subset of input, partition-layout invariant") {
    val capped = Sampling.stratifiedCap(docs, "lang", "doc_id", 20)
    val perLang = capped.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang.values.forall(_ <= 20))
    // strata smaller than the cap survive whole
    val full = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    full.foreach { case (l, n) => assert(perLang(l) == math.min(n, 20L)) }
    // the draw must not depend on physical layout
    val a = capped.select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.stratifiedCap(docs.repartition(13), "lang", "doc_id", 20)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("split: total partition, ~90/5/5, stable under appends") {
    val split = docs.select(col("doc_id"), Sampling.splitLabel(col("doc_id")).as("s"))
    val counts = split.groupBy("s").count().as[(String, Long)].collect().toMap
    val n = counts.values.sum
    assert(n == docs.count())
    assert(counts("train").toDouble / n > 0.8 && counts("train").toDouble / n < 0.97)
    assert(counts.keySet == Set("train", "valid", "test"))
    // stability: a row's split is a pure function of its id — the same
    // ids on a subset produce the same labels
    val sub = docs.filter(col("doc_id") < 100)
      .select(col("doc_id"), Sampling.splitLabel(col("doc_id")).as("s"))
      .as[(Long, String)].collect().toMap
    val whole = split.as[(Long, String)].collect().toMap
    sub.foreach { case (id, s) => assert(whole(id) == s) }
  }

  test("corpus_mix: per-language draw hits min(quota, available) exactly") {
    val quota = Map("en" -> 80L, "es" -> 40L, "fr" -> 40L, "de" -> 20L, "zh" -> 20L)
    val docs = sources.Tables.documents(spark, SparkTestSession.sf001)
    val avail = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val got = SparkEntry.queries("corpus_mix")(spark, SparkTestSession.sf001)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    quota.foreach { case (lang, q) =>
      assert(got.getOrElse(lang, 0L) == math.min(q, avail.getOrElse(lang, 0L)),
        s"$lang draw ${got.get(lang)} != min($q, ${avail.get(lang)})")
    }
    // determinism: the draw is a pure function of ids — rerun matches
    val a = SparkEntry.queries("corpus_mix")(spark, SparkTestSession.sf001)
      .as[(Long, String)].collect().toSeq
    val b = SparkEntry.queries("corpus_mix")(spark, SparkTestSession.sf001)
      .as[(Long, String)].collect().toSeq
    assert(a == b)
  }

  test("split_group_holdout: no user leaks across splits; users partition exactly") {
    val events = sources.Tables.events(spark, SparkTestSession.sf001)
    val out = SparkEntry.queries("split_group_holdout")(spark, SparkTestSession.sf001)
      .as[(String, Long, Long)].collect()
    assert(out.map(_._1).toSet.subsetOf(Set("train", "valid", "test")))
    // the no-leak law: every user lands in exactly ONE split, so the
    // per-split distinct-user counts sum to the corpus's distinct users
    val totalUsers = events.select(countDistinct("user_id")).collect().head.getLong(0)
    assert(out.map(_._2).sum == totalUsers,
      s"user counts ${out.map(_._2).sum} != $totalUsers — a user straddles splits")
    assert(out.map(_._3).sum == events.count())
    // directly: (user, split) pairs == users
    val p = substring(md5(concat(col("user_id").cast("string"), lit(":gsplit"))), 1, 8)
    val lbl = when(p < "cccccccd", "train").when(p < "e6666666", "valid").otherwise("test")
    val pairs = events.select(col("user_id"), lbl.as("s")).distinct().count()
    assert(pairs == totalUsers)
  }
}
