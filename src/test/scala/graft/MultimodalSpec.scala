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

  test("stub resize: fixed output size, nearest-neighbor resample matches JVM reference") {
    val resized = Multimodal.resizeMedia(Multimodal.asMedia(docs), 16, 16)
      .collect().map(r => r.doc_id -> r).toMap
    val ref = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(resized.keySet == ref.keySet)
    ref.foreach { case (id, text) =>
      val in = text.getBytes("UTF-8")
      val r = resized(id)
      assert(r.payload.length == 256, s"doc $id: resize must be fixed-size")
      assert(r.n_bytes_in == in.length)
      val expect = Array.tabulate(256)(i =>
        if (in.isEmpty) 0.toByte else in((i.toLong * in.length / 256).toInt))
      assert(r.payload.toSeq == expect.toSeq, s"doc $id resample mismatch")
    }
  }

  test("stub frame sampling: every 4th 256-byte frame of video payloads only") {
    val media = Multimodal.asMedia(docs)
    val frames = Multimodal.sampleFrames(media).collect()
    val videoIds = media.filter(_.media_type == "video")
      .collect().map(m => m.doc_id -> m.payload).toMap
    assert(frames.map(_.doc_id).toSet == videoIds.keySet,
      "every video doc yields frames (frame 0 always sampled), nothing else does")
    frames.groupBy(_.doc_id).foreach { case (id, fs) =>
      val nFrames = (videoIds(id).length + 255) / 256
      assert(fs.map(_.frame_no).sorted.toSeq == (0 until nFrames by 4).toSeq)
      // all full frames are 256 bytes; the tail frame carries the remainder
      fs.foreach { f =>
        val want = math.min(256, videoIds(id).length - f.frame_no * 256)
        assert(f.n_bytes == want)
      }
    }
  }
}
