package graft

import graft.operators.Similarity
import graft.sources.Tables

/** Ad-hoc measurement harness (not a test): mean top-10 ANN recall vs
  * the exact path at several (nPlanes, nTables) configs, to pick
  * defaults that keep SimilaritySpec's ≥ 0.5 recall bound binding with
  * margin. Run: sbt "Test/runMain graft.RecallSweep" */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val emb = Tables.embeddings(spark, SparkTestSession.sf0001)
    val exact = Similarity.cosineTopK(emb, 8, 10)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    for ((p, t, seed) <- Seq((5, 16, 42L), (5, 16, 7L), (5, 16, 99L),
                             (6, 24, 42L), (6, 24, 7L), (6, 24, 99L),
                             (6, 1, 42L), (5, 1, 42L))) {
      val t0 = System.nanoTime()
      val ann = Similarity.annTopK(emb, 8, 10, p, t, seed)
        .as[(Long, Int, Long, Double)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
      val recalls = exact.map { case (q, ids) =>
        ann.getOrElse(q, Set.empty).intersect(ids).size.toDouble / ids.size }
      println(f"planes=$p%2d tables=$t%2d seed=$seed%3d  mean_recall=${recalls.sum / recalls.size}%.3f  wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
