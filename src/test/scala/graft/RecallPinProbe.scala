package graft

import graft.operators.Similarity
import graft.sources.Tables

/** Dev-only: measure the sf0.1 quantities the recall CI pins assert,
  * so the pinned floors are set from data, not guesses.
  * Run: sbt "Test/runMain graft.RecallPinProbe" */
object RecallPinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val d = SparkTestSession.sf01
    val emb = Tables.embeddings(spark, d)
    def lists(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[(Long, Int)]] =
      df.as[(Long, Int, Long, Double)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._2)).toSeq).toMap
    val exact = lists(Similarity.cosineTopK(emb, 8, 10))
    def recall(m: Map[Long, Seq[(Long, Int)]]): Double =
      exact.map { case (q, ids) =>
        m.getOrElse(q, Seq.empty).map(_._1).toSet
          .intersect(ids.map(_._1).toSet).size.toDouble / ids.size }.sum / exact.size
    val lsh = lists(Similarity.annTopK(emb, 8, 10, idx = Some((spark, d))))
    val ivf = lists(Similarity.ivfTopK(emb, 8, 10, idx = Some((spark, d))))
    val sq8 = lists(Similarity.sq8TopK(emb, 8, 10))
    println(f"[pin] lsh_recall=${recall(lsh)}%.3f ivf_recall=${recall(ivf)}%.3f sq8_recall=${recall(sq8)}%.3f")
    // SQ8 rank displacement over ids present in both lists
    val disp = for {
      (q, ex) <- exact.toSeq
      exRank = ex.toMap.map { case (id, r) => id -> r }
      (id, r8) <- sq8.getOrElse(q, Seq.empty)
      re <- exRank.get(id)
    } yield math.abs(re - r8)
    println(s"[pin] sq8_rank_disp max=${disp.max} mean=${disp.sum.toDouble / disp.size}")
    spark.stop()
  }
}
