package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once / read-many index artifacts (VERDICT r04 task 1).
  *
  * Several operator families are backed by a derived table that a real
  * deployment builds ONCE at ingest and reuses across every query that
  * follows: the part co-order pair/edge table (co-occurrence, PMI,
  * triangles, k-hop), LSH postings and IVF centroids (ANN), MinHash
  * signatures (near-dup), corpus fingerprints (incremental dedup), and
  * the connected-component label table (dedup clustering). Rebuilding
  * any of them inside each query is the single-query-demo shape; at
  * 100 TB the artifact is a bucketed parquet table in the catalog.
  *
  * [[table]] is that persistence step: the first caller materializes
  * the artifact through [[graft.operators.Physical.writeBucketed]]
  * (bucketed + per-bucket-sorted parquet via the session catalog — a
  * bucketed table joins/aggregates on its bucket key with no
  * Exchange), every later caller — same query re-run, or a DIFFERENT
  * query sharing the artifact — gets the catalog table back. Artifact
  * names carry the scale-factor directory (hashed) plus any
  * config knobs, so sf0.01 tests and sf0.1 bench runs never collide
  * and a config change is a different artifact.
  *
  * Correctness contract: reading the persisted artifact must be
  * result-identical to inlining its build plan — all builds here are
  * deterministic functions of the input tables, and parquet
  * round-trips longs/doubles/arrays exactly. IndexesSpec asserts the
  * equivalence per artifact; the oracle gate re-proves it end-to-end
  * (CORRECTNESS hashes are unchanged vs the inline forms of r04).
  */
object Indexes {

  /** One DataFrame per (session, table): the repeated `s.table` lookup
    * is cheap, but memoizing keeps a stable plan object and documents
    * the build-once contract in the type. Identity-keyed WeakHashMap:
    * distinct live sessions can never collide (unlike an identity
    * HASH key), and a stopped session's entries become collectable
    * instead of pinning the session for the JVM lifetime. All access
    * is under the object lock below. */
  private val memo =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, DataFrame]]()

  private def slug(sfDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** Visible-for-tests: the catalog name an artifact lands under. */
  private[graft] def tableName(sfDir: String, name: String): String =
    s"graft_idx_${slug(sfDir)}_$name"

  /** Build-once bucketed artifact: returns the catalog table, building
    * it from `build` only if this session hasn't yet. `bucketKeys`
    * empty writes a plain (unbucketed) table — for tiny artifacts like
    * centroid sets where bucketing buys nothing. */
  def table(s: SparkSession, sfDir: String, name: String,
            bucketKeys: Seq[String], nBuckets: Int = 32)
           (build: => DataFrame): DataFrame = this.synchronized {
    val tbl = tableName(sfDir, name)
    val perSession = memo.computeIfAbsent(s,
      _ => scala.collection.mutable.Map.empty[String, DataFrame])
    perSession.getOrElseUpdate(tbl, {
      if (!s.catalog.tableExists(tbl)) {
        // a directory left by a previous JVM is invisible to this
        // in-memory catalog but blocks the managed CREATE TABLE —
        // clear our own stale artifact before rebuilding
        val loc = new Path(new Path(s.conf.get("spark.sql.warehouse.dir")), tbl)
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
        if (bucketKeys.nonEmpty)
          operators.Physical.writeBucketed(build, tbl, bucketKeys, nBuckets)
        else build.write.format("parquet").mode("overwrite").saveAsTable(tbl)
      }
      s.table(tbl)
    })
  }
}
