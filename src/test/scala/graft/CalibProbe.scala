package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Clustering, NearDup}
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

      // r17 VERDICT task 7: planted-pair recall measured IN THE SAME
      // RUN as the bucket census, so at fixtures where the 64-doc cap
      // actively drops buckets (500k+ docs: 37k dropped, CALIB_r17)
      // the recall cost is recorded exactly where it bites — the
      // neardup_recall_bounds floor (0.80) evaluated alongside the
      // dropped_buckets count instead of only at oracle scales.
      val planted = docs.filter(col("doc_id") < 50).count()
      val found = NearDup.minhashPairs(docs, 0.5)
        .filter(col("id2") === col("id1") + 100000L && col("id1") < 50).count()
      val floorOk = if (planted == 0) true else found.toDouble / planted >= 0.80
      println(f"[calib-recall] dir=$d planted=$planted found=$found " +
        f"recall=${if (planted == 0) 0.0 else found.toDouble / planted}%.3f " +
        f"floor=0.80 floor_ok=$floorOk dropped_buckets=$dropped")

      // r15 VERDICT task 4a: simhash_near_dup_pairs growth attribution
      // (220.6 s / 1.59x per-row at 100x — the adaptive cap's designed
      // growth phase). Same census as above, over the SAME corpus the
      // registered query runs (withPlantedDups), against the capEff
      // model: candidates <= kept-bucket pair slots <= n*4*(capEff-1)/2.
      val ssigs = NearDup.simhashSignatures(docs).localCheckpoint()
      val sn = ssigs.count()
      val capEff = NearDup.simhashCapEff(sn)
      val sstats = NearDup.simhashChunkStats(ssigs).localCheckpoint()
      val skept = sstats.filter(col("bucket_n") <= capEff)
      val scensus = skept.agg(
        count(lit(1)).as("kept"),
        max(col("bucket_n")).as("max_kept"),
        sum((col("bucket_n") * (col("bucket_n") - 1) / 2).cast("long")).as("pair_slots")).head()
      val sdropped = sstats.count() - scensus.getLong(0)
      val st0 = System.nanoTime()
      // maxHamming=64 keeps every candidate pair — measures the join
      // volume the hamming filter then prunes, i.e. the cost driver
      val scand = NearDup.simhashPairs(docs, 64).count()
      val ssecs = (System.nanoTime() - st0) / 1e9
      println(f"[calib-simhash] dir=$d n_docs=$sn candidates=$scand ($ssecs%.1f s) " +
        f"per_doc=${scand.toDouble / sn}%.2f " +
        f"linear_bound_per_doc=${4L * (capEff - 1) / 2} " +
        f"pair_slots=${scensus.getAs[Long]("pair_slots")} " +
        f"kept_buckets=${scensus.getLong(0)} dropped_buckets=$sdropped " +
        f"max_kept_bucket=${scensus.getAs[Long]("max_kept")} cap_eff=$capEff")

      // r15 VERDICT task 4b: best_match_fuzzy growth attribution
      // (112.6 s / 1.09x per-row at 100x — ~linear candidate
      // densification from the copies fixture). The cost driver is the
      // band-block join volume sum_b(odd_b * even_b); measured against
      // the scored-row count the operator actually produces.
      val bdocs = Tables.documents(spark, d)
      val memb = Clustering.fingerprintBuckets(bdocs).localCheckpoint()
      val bn = bdocs.count()
      // r17: the operator scores one representative per (content,
      // parity) over HASHED shingle sets — record the rep-block volume
      // (its actual join size) alongside the full band-block bound
      val bsets = bdocs.select(col("doc_id"),
          array_distinct(graft.functions.TextFns.ngrams(col("text"), 3)).as("s"))
        .filter(size(col("s")) > 0)
      val bkeys = bsets.select(col("doc_id"),
        sha2(array_join(array_sort(col("s")), "\u0001"), 256).as("ck"))
      val brepIds = bkeys.groupBy(col("ck"), pmod(col("doc_id"), lit(2)).as("par"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      val membR = Clustering.fingerprintBuckets(
        bdocs.join(brepIds, Seq("doc_id"), "left_semi")).localCheckpoint()
      val repVolume = membR
        .groupBy("bucket")
        .agg(sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L)).as("odd"),
          sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("even"))
        .agg(sum(col("odd") * col("even")))
        .head().getLong(0)
      val bcensus = memb
        .groupBy("bucket")
        .agg(sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L)).as("odd"),
          sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("even"))
        .agg(sum(col("odd") * col("even")).as("join_rows"),
          max(col("odd") + col("even")).as("max_bucket"),
          count(lit(1)).as("buckets")).head()
      val bt0 = System.nanoTime()
      val scored = memb.filter(col("doc_id") % 2 === 1)
        .select(col("bucket"), col("doc_id").as("bdoc"))
        .join(memb.filter(col("doc_id") % 2 === 0)
          .select(col("bucket"), col("doc_id").as("cdoc")), "bucket")
        .count()
      val bsecs = (System.nanoTime() - bt0) / 1e9
      println(f"[calib-bmf] dir=$d n_docs=$bn scored_rows=$scored ($bsecs%.1f s) " +
        f"per_batch_doc=${scored.toDouble / math.max(1L, bn / 2)}%.2f " +
        f"rep_block_volume=$repVolume " +
        f"band_block_bound=${bcensus.getAs[Long]("join_rows")} " +
        f"buckets=${bcensus.getAs[Long]("buckets")} " +
        f"max_bucket=${bcensus.getAs[Long]("max_bucket")}")

      // r18 (r17 VERDICT task 1): the CAPPED rep-block volume — each
      // bucket's corpus (even) side clamped at BmfBucketCap min-id
      // reps, exactly the postings artifact the operator now joins —
      // next to the uncapped rep volume above, plus the even-side
      // occupancy ceiling the no-op-at-oracle-scales claim rides on
      // (max_even_rep < cap ⟺ the cap provably changed nothing).
      val ccensus = membR
        .groupBy("bucket")
        .agg(sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L)).as("odd"),
          sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("even"))
        .agg(sum(col("odd") * least(col("even"), lit(NearDup.BmfBucketCap.toLong)))
            .as("capped_rows"),
          max(col("even")).as("max_even_rep"),
          sum(when(col("even") > NearDup.BmfBucketCap, 1L).otherwise(0L))
            .as("engaged")).head()
      println(f"[calib-bmf-cap] dir=$d cap=${NearDup.BmfBucketCap} " +
        f"capped_rep_volume=${ccensus.getAs[Long]("capped_rows")} " +
        f"uncapped_rep_volume=$repVolume " +
        f"max_even_rep_bucket=${ccensus.getAs[Long]("max_even_rep")} " +
        f"engaged_buckets=${ccensus.getAs[Long]("engaged")} " +
        f"per_batch_doc_bound=${4L * NearDup.BmfBucketCap}")
    }
    spark.stop()
  }
}
