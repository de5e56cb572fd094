package graft

import graft.operators.{Physical, TextPipeline}
import graft.sources.Sinks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Drop-in CLI for the reference job (reference/WordCount.java:129-160,
  * `hadoop jar wc.jar WordCount <input> <output> [n]`):
  *
  * {{{
  *   spark-submit --class graft.WordCount graft.jar \
  *     <input-text-dir> <output-dir> [n=3] [numParts=7]
  * }}}
  *
  * Same lifecycle, Spark-native: text files in → normalize → tokenize →
  * n-gram windows (the codegen'd [[graft.functions.NGramsExpr]], n=1 is
  * the word-count fast path) → partial+final count (Spark's map-side
  * combine = the reference's combiner) → first-char range placement
  * ([[Physical.referencePlacement]], bit-faithful to WCPartitioner's
  * integer-division math) → per-partition sort → `key\tcount` TSV part
  * files, one per bucket, which concatenate to a globally sorted file —
  * byte-compatible with the reference's reducer outputs.
  *
  * A user of the reference switches by replacing the `hadoop jar`
  * invocation; input/output dirs and the optional n keep their meaning
  * (numParts generalizes the reference's hardcoded reducer count).
  */
object WordCount {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: WordCount <input-text-dir> <output-dir> [n=3] [numParts=7]")
    val Array(input, output) = args.take(2)
    // tolerant parse like the reference (reference/WordCount.java:129-136):
    // a malformed n falls back to the default 3 with a warning, so a
    // drop-in invocation with a bad third arg still runs
    val n = if (args.length >= 3) {
      scala.util.Try(args(2).toInt).getOrElse {
        System.err.println(s"WARN: unparsable n '${args(2)}', defaulting to 3")
        3
      }
    } else 3
    val numParts = if (args.length >= 4) args(3).toInt else 7
    require(n >= 1 && numParts >= 1)
    // inherits the submit-time master/conf; standalone local runs get
    // sane defaults without overriding a provided session
    val spark = SparkSession.builder()
      .appName(s"graft-wordcount-n$n")
      .getOrCreate()
    // wholetext: each FILE is one document, so n-gram windows span line
    // breaks — the reference's mapper keeps a queue across lines for
    // exactly this (reference/WordCount.java:68-91); plain line-wise
    // read would silently drop every cross-newline n-gram for n >= 2.
    // Operating envelope: wholetext materializes each file as ONE row
    // in one task, so per-FILE size is bounded by task memory (and
    // hard-capped near 2 GB by the JVM array limit) — right for the
    // reference's e-book corpus (many files, each modest); a corpus of
    // multi-GB single files should be split upstream or fed through
    // the documents-table pipeline, which this CLI wraps
    val counts = TextPipeline.ngramCountUnsorted(
      spark.read.option("wholetext", "true").text(input), "value", n)
    Sinks.writeTsv(
      counts
        .repartition(numParts, Physical.referencePlacement(col("ngram"), numParts))
        .sortWithinPartitions("ngram"),
      output)
  }
}
