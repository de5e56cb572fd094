package graft

/** Pre-builds the persisted [[Indexes]] artifacts the registry's
  * index-backed queries read, attributing the once-per-fixture build
  * cost SEPARATELY from steady-state query cost (r16 VERDICT task 4:
  * SCALE100_r16's knn_graph_lsh number conflated the ~2.5 GB pv
  * artifact write with the query it feeds, so its per-row ratio meant
  * two things at once).
  *
  * For each query it runs the plan twice through the same noop-sink
  * materialization Bench times, printing one JSON line per query:
  *
  *   {"query":"knn_graph_lsh","first_sec":92.1,"steady_sec":3.9}
  *
  * first ≫ steady attributes the artifact build; first ≈ steady means
  * the artifact was already on disk (adopted, nothing to attribute).
  * round_final.sh runs this against the 100× fixture BEFORE the reps=1
  * stress bench and keeps the output as SCALE100_BUILD_r{N}.txt, so
  * the stress bench itself measures steady state only.
  *
  * Args: query names; default = every registry query whose plan builds
  * or adopts an Indexes artifact (kept in lockstep with the
  * `Indexes.table` call sites — a missing name is harmless: that
  * query's build lands in the bench's untimed warm-up run instead).
  */
object IndexWarm {

  val IndexBacked: Seq[String] = Seq(
    // Similarity.scala: LSH postings, knn pv, IVF, PQ artifacts
    "ann_lsh_topk", "ann_ivf_topk", "ann_pq_topk",
    "knn_graph_lsh", "knn_graph_bound",
    // NearDup.scala: planted-corpus LSH/minhash sigs, semdedup_best
    "embedding_near_dup_lsh", "minhash_near_dup_pairs", "semdedup_keep",
    // Dedup.scala: passage table, corpus fingerprints
    "dedup_passages", "dedup_incremental",
    // Graph.scala: symmetrized trade edges + degrees, oriented co-order
    "pagerank_trade", "triangle_count", "khop_2_reach",
    // Associations.scala / Clustering.scala: co-order pair tables, CC labels
    "cooccur_parts", "pmi_parts", "frequent_triples", "cc_components")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else IndexBacked
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = Bench.session()
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val (first, steady) =
        try (run(n), run(n))
        catch { case e: Throwable =>
          System.err.println(s"[indexwarm] $n failed: ${e.getMessage}")
          (-1.0, -1.0)
        }
      def r3(x: Double) = math.rint(x * 1000) / 1000
      println(s"""{"query":"$n","first_sec":${r3(first)},"steady_sec":${r3(steady)}}""")
    }
    spark.stop()
  }
}
