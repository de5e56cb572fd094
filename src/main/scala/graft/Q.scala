package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query: the Spark implementation plus (optionally) an
  * equivalent ANSI SQL string the driver runs in DuckDB as a differential
  * oracle. Column names and row order MUST match between the two (the
  * driver sorts columns by name and hash-compares values).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** flagship queries highlighted in reporting; the driver's Bench
      * times EVERY registered query, not just these */
    headline: Boolean = false)

object Q {
  /** Oracled query. */
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  /** Query with no SQL-expressible oracle (driver records a rows-only check). */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
