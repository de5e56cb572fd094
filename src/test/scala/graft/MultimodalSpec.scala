package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** X6 multimodal plumbing tests: binary payload schema, deterministic
  * fake decode, batching, and partition independence. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val docs = sources.Tables.documents(spark, SparkTestSession.sf0001)

  test("media schema: binary payload + typed metadata, one row per doc") {
    val media = Multimodal.asMedia(docs)
    val sch = media.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(sch("payload") == "binary")
    assert(sch("media_type") == "string")
    assert(media.count() == docs.count())
    val types = media.select("media_type").distinct().as[String].collect().toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("fake decode is deterministic and matches a JVM-side reference") {
    val feats = Multimodal.mediaFeatures(Multimodal.asMedia(docs))
      .collect().map(f => f.doc_id -> f).toMap
    val ref = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    ref.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      var h = 1125899906842597L
      bytes.foreach(b => h = 31 * h + (b & 0xff))
      val f = feats(id)
      assert(f.checksum == h, s"doc $id checksum")
      assert(f.n_bytes == bytes.length)
      assert(f.width >= 16 && f.width < 256 && f.height >= 16 && f.height < 256)
    }
  }

  test("decode output is partitioning-invariant (batch boundaries don't leak)") {
    val media = Multimodal.asMedia(docs)
    val a = Multimodal.mediaFeatures(media.repartition(1)).collect().sortBy(_.doc_id).toSeq
    val b = Multimodal.mediaFeatures(media.repartition(13)).collect().sortBy(_.doc_id).toSeq
    assert(a == b)
  }
}
