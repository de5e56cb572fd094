package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.NearDup
import graft.sources.Tables

/** X75 candidate-count attribution probe (r14 VERDICT task 6):
  * minhash_calibration's cost is |candidates| exact-Jaccard
  * verifications, and its 10× per-row growth (1.6×) comes from the
  * copies-based planted fixture densifying LSH buckets — this probe
  * MEASURES that, per fixture, instead of leaving it judge inference:
  *   - n_docs (with planted dups, the calibration corpus),
  *   - candidates: distinct pairs sharing a kept band bucket at
  *     threshold 0.0 — exactly the calibration query's join input,
  *   - per-doc candidate rate and its LINEAR bound
  *     Bands·(maxBucket−1)/2 (cap-guaranteed, scale-safe),
  *   - bucket census: kept/dropped buckets, max kept occupancy.
  * Run (tee to CALIB_r{N}.txt as a round record):
  *   sbt "Test/runMain graft.CalibProbe /root/testdata/sf0.1 /tmp/graft_sf1"
  */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    dirs.foreach { d =>
      val docs = NearDup.withPlantedDups(Tables.documents(spark, d))
      val sigs = NearDup.minhashSignatures(docs).localCheckpoint()
      val n = sigs.count()
      val stats = NearDup.minhashBandStats(sigs).localCheckpoint()
      val kept = stats.filter(col("bucket_n") <= NearDup.maxBucket)
      val census = kept.agg(
        count(lit(1)).as("kept"),
        max(col("bucket_n")).as("max_kept"),
        sum((col("bucket_n") * (col("bucket_n") - 1) / 2).cast("long")).as("pair_slots")).head()
      val dropped = stats.count() - census.getLong(0)
      val t0 = System.nanoTime()
      val cand = NearDup.minhashPairs(docs, 0.0).count()
      val secs = (System.nanoTime() - t0) / 1e9
      val perDoc = cand.toDouble / n
      val bound = NearDup.Bands.toLong * (NearDup.maxBucket - 1) / 2
      println(f"[calib] dir=$d n_docs=$n candidates=$cand ($secs%.1f s) " +
        f"per_doc=$perDoc%.2f linear_bound_per_doc=$bound " +
        f"pair_slots=${census.getAs[Long]("pair_slots")} " +
        f"kept_buckets=${census.getLong(0)} dropped_buckets=$dropped " +
        f"max_kept_bucket=${census.getAs[Long]("max_kept")} cap=${NearDup.maxBucket}")
    }
    spark.stop()
  }
}
