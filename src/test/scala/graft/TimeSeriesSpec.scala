package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X40c/X49 guard rails. The load-bearing case is the weekday slot:
  * `seasonal_decompose` buckets days by distance-from-anchor mod 7, and
  * both Spark's `%` and DuckDB's `%` keep the dividend's sign — so a
  * signed modulus silently splits each weekday into TWO seasonal slots
  * for any date before the 1995-01-01 anchor. The generated data's
  * min(o_orderdate) happens to equal the anchor, which hid the bug
  * (ADVICE r06); this suite pins the pre-anchor behavior so the query
  * stays correct on data the oracle run never sees. */
class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // the exact slot expressions the query and its oracle use
  private def sparkSlot = pmod(
    datediff(col("d").cast("date"), lit("1995-01-01").cast("date")), lit(7))
  private def oracleSlot(daysFromAnchor: Long): Long =
    ((daysFromAnchor % 7) + 7) % 7 // DuckDB spelling, evaluated here

  test("weekday slot is stable across the anchor (pre-1995 dates)") {
    import spark.implicits._
    // 4 weeks straddling the anchor, one row per day
    val days = spark.range(-14, 15)
      .select(col("id"), date_add(lit("1995-01-01").cast("date"), col("id").cast("int")).as("d"))
    val got = days.select(col("id"), sparkSlot.as("slot"))
      .as[(Long, Int)].collect().toMap

    // every slot in [0,7); same calendar weekday → same slot on both
    // sides of the anchor; Spark slot == oracle slot for every offset
    got.foreach { case (off, slot) =>
      assert(slot >= 0 && slot < 7, s"offset $off slot $slot out of range")
      assert(slot.toLong == oracleSlot(off),
        s"offset $off: Spark slot $slot != oracle slot ${oracleSlot(off)}")
    }
    (-14L to 7L).foreach { off =>
      assert(got(off) == got(off + 7),
        s"weekday split across anchor: offset $off slot ${got(off)} vs ${got(off + 7)}")
    }
    // regression shape: a SIGNED modulus would map offset -1 to -1, the
    // fixed expression maps it to 6 (same slot as offset +6)
    assert(got(-1L) == 6 && got(-1L) == got(6L))
  }

  test("seasonal_decompose stays green (oracle-shape smoke)") {
    // the registry query itself on the real table: residuals must close
    // the decomposition identity on the already-rounded display columns
    val rows = SparkEntry.queries("seasonal_decompose")(spark, SparkTestSession.sf0001)
      .select(col("total"), col("trend"), col("seasonal"), col("residual"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, trend, seasonal, resid) =
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(total - trend - seasonal - resid) < 1e-5)
    }
  }
}
