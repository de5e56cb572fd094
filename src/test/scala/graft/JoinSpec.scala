package graft

import graft.operators.{AsOfJoin, Skew}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join picks most recent right row at-or-before left ts, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"),
      (2L, ts("2024-01-01 09:00:00"), "e3")
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 200.0),
      (2L, ts("2024-01-01 09:00:00"), 300.0), // equal ts → inclusive match
      (3L, ts("2024-01-01 08:00:00"), 400.0)
    ).toDF("user_id", "ts", "amount")

    val got = AsOfJoin.join(left, right, "user_id", "ts", "ts", Seq("amount"))
      .select("tag", "asof_amount").as[(String, Option[Double])].collect().toMap
    assert(got("e1") == Some(100.0))
    assert(got("e2") == Some(200.0))
    assert(got("e3") == Some(300.0))
  }

  test("forward as-of picks earliest right row at-or-after left ts, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "e1"),
      (1L, ts("2024-01-01 12:00:00"), "e2"), // after last right row → null
      (2L, ts("2024-01-01 09:00:00"), "e3") // equal ts → inclusive match
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 1.0), // before e1: must NOT match
      (1L, ts("2024-01-01 11:00:00"), 2.0),
      (2L, ts("2024-01-01 09:00:00"), 3.0),
      (3L, ts("2024-01-01 23:00:00"), 4.0) // other key: never visible
    ).toDF("user_id", "ts", "amount")
    val got = AsOfJoin.firstTimestamp(left, right, "user_id", "ts", "ts")
      .select("tag", "next_ts").as[(String, Option[java.sql.Timestamp])].collect().toMap
    assert(got("e1") == Some(ts("2024-01-01 11:00:00")))
    assert(got("e2").isEmpty)
    assert(got("e3") == Some(ts("2024-01-01 09:00:00")))
  }

  test("as-of join yields null when no prior right row") {
    val left = Seq((1L, ts("2024-01-01 08:00:00"), "early")).toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1.0)).toDF("user_id", "ts", "amount")
    val got = AsOfJoin.join(left, right, "user_id", "ts", "ts", Seq("amount"))
      .select("asof_amount").as[Option[Double]].head()
    assert(got.isEmpty)
  }

  test("bucketed as-of == plain as-of on real events, tiny buckets force carry-ins") {
    val ev = sources.Tables.events(spark, SparkTestSession.sf0001)
    val right = ev.filter(col("event_type") === "purchase")
    val plain = AsOfJoin.lastTimestamp(ev, right, "user_id", "ts", "ts")
      .select("event_id", "asof_ts")
      .as[(Long, Option[java.sql.Timestamp])].collect().toMap
    // 10-minute buckets over ~minutes-apart events: most lookups must
    // cross bucket boundaries, exercising the carry-in path hard
    val bucketed = AsOfJoin.lastTimestampBucketed(ev, right, "user_id", "ts", "ts",
      bucketSeconds = 600L)
      .select("event_id", "asof_ts")
      .as[(Long, Option[java.sql.Timestamp])].collect().toMap
    assert(bucketed == plain)
  }

  test("salted join equals plain join") {
    val li = sources.Tables.lineitem(spark, SparkTestSession.sf0001)
    val o = sources.Tables.orders(spark, SparkTestSession.sf0001)
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey")).count()
    val salted = Skew.saltedJoin(li, o, "l_orderkey", 8,
      Seq("l_partkey", "l_suppkey", "l_linenumber")).count()
    assert(plain == salted)
  }

  test("salted two-phase count equals plain groupBy count") {
    val li = sources.Tables.lineitem(spark, SparkTestSession.sf0001)
    val plain = li.groupBy("l_returnflag").count()
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedCount(li, "l_returnflag", 8,
      Seq("l_orderkey", "l_partkey"))
      .as[(String, Long)].collect().toMap
    assert(plain == salted)
  }
}
