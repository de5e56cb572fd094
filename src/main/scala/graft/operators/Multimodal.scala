package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** One multimodal record: opaque binary payload + typed metadata —
  * the schema shape for image/audio/video columns at rest. */
case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

/** Output of the (stubbed) decode/feature-extract stage. */
case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Int,
    checksum: Long, width: Int, height: Int)

/** Output of the (stubbed) resize stage: fixed-size resampled payload. */
case class ResizedMedia(doc_id: Long, media_type: String, width: Int,
                        height: Int, n_bytes_in: Int, payload: Array[Byte])

/** One sampled frame of a "video" payload. */
case class MediaFrame(doc_id: Long, frame_no: Int, n_bytes: Int, checksum: Long)

/** Multimodal pipeline (SURVEY.md §2b X6 + the training-data mandate's
  * multimodal-columns item).
  *
  * Two parts:
  *   - [[all]]'s `multimodal_join`: text × vector × JSON-props in ONE
  *     relational pipeline (documents ⋈ embeddings on the 1:1
  *     doc_id=vec_id key, then events joined by their JSON `k` doc
  *     reference) — fully oracled.
  *   - [[mediaFeatures]]: the binary-column path. Media payloads are
  *     opaque `binary` with typed metadata; decode/feature-extract runs
  *     as a typed batched `mapPartitions` — the ONE place the engine
  *     uses ladder step (d) (SURVEY.md §2b), because decoding opaque
  *     bytes is genuine per-partition imperative work no Catalyst
  *     expression expresses. The decode itself is a DETERMINISTIC FAKE
  *     (polynomial checksum → pretend width/height): the container has
  *     no image/audio codecs, so the stub stands in for e.g. a JPEG
  *     decoder while the Spark-side contract — schema, encoders,
  *     batching, partition parallelism — is real and tested
  *     (MultimodalSpec).
  */
object Multimodal {

  /** Documents re-cast as binary media records (payload = UTF-8 bytes;
    * media_type fanned out deterministically from the id). */
  def asMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Batched decode/feature-extract over binary payloads. Batches of 64
    * mirror a vectorized decoder's input shape; each partition decodes
    * independently (embarrassingly parallel at any scale). */
  def mediaFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(64).flatMap { batch =>
        batch.map { r =>
          // --- deterministic FAKE decode (stand-in for a real codec) ---
          // checksum: 31-polynomial over payload bytes, overflow wrapped.
          var h = 1125899906842597L
          var i = 0
          while (i < r.payload.length) { h = 31 * h + (r.payload(i) & 0xff); i += 1 }
          val w = 16 + (java.lang.Long.remainderUnsigned(h, 240)).toInt
          val ht = 16 + (java.lang.Long.remainderUnsigned(h >>> 8, 240)).toInt
          MediaFeatures(r.doc_id, r.media_type, r.payload.length, h, w, ht)
        }
      }
    }
  }

  /** Stubbed resize: nearest-neighbor resample of the byte stream to a
    * fixed w×h payload — the stand-in for bilinear image resize, with
    * the real contract intact: fixed output size regardless of input,
    * batched per partition, no state across rows. */
  def resizeMedia(media: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-row map (unlike mediaFeatures there is no vectorized-decoder
      // batch shape to mirror here — resample is element-wise)
      rows.map { r =>
        val n = w * h
        val len = r.payload.length
        val out = new Array[Byte](n)
        var i = 0
        // nearest-neighbor index map (the same arithmetic a 1-D NN
        // image scale uses); zero-fill for empty payloads
        while (i < n) {
          out(i) = if (len == 0) 0 else r.payload((i.toLong * len / n).toInt)
          i += 1
        }
        ResizedMedia(r.doc_id, r.media_type, w, h, len, out)
      }
    }
  }

  /** Stubbed frame sampling: treat a "video" payload as fixed-size
    * frames and keep every `everyNth` one (uniform temporal sampling —
    * the training-data shape for video). Fan-out happens inside the
    * partition (one input row → ~frames/everyNth output rows), so the
    * operator is a flatMap with no shuffle; downstream repartitioning
    * is the caller's choice. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 256,
                   everyNth: Int = 4): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "video").as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        r.payload.grouped(frameBytes).zipWithIndex.collect {
          case (f, i) if i % everyNth == 0 =>
            var h = 1125899906842597L
            var j = 0
            while (j < f.length) { h = 31 * h + (f(j) & 0xff); j += 1 }
            MediaFrame(r.doc_id, i, f.length, h)
        }
      }
    }
  }

  def all: Seq[Q] = Seq(

    // X6: text ⋈ vector ⋈ JSON in one pipeline. Plan: 1:1 SMJ/BHJ of
    // the two 500-row tables builds the per-doc feature side, which is
    // then BROADCAST into the big events stream (events is the only
    // table that scales); one final hash agg. DECIMAL sums for
    // order-independent totals (see Aggregates scaladoc).
    Q("multimodal_join",
      """WITH feats AS (
        |  SELECT d.doc_id, d.lang, d.n_chars, e.label,
        |    round(sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x))), 6) AS l2
        |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
        |ev AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS ref_id, value
        |  FROM events)
        |SELECT f.lang, f.label,
        |  count(*) AS n_events,
        |  count(DISTINCT f.doc_id) AS n_docs,
        |  CAST(SUM(CAST(ev.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  CAST(SUM(CAST(f.l2 AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_l2
        |FROM ev JOIN feats f ON ev.ref_id = f.doc_id
        |GROUP BY f.lang, f.label
        |ORDER BY f.lang, f.label""".stripMargin) { (s, d) =>
      val docs = Tables.spread(s, d, "documents")
      val emb = Tables.spread(s, d, "embeddings")
      val feats = docs.join(emb, col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("label"),
          round(sqrt(Similarity.norm2(col("embedding").cast("array<double>"))), 6).as("l2"))
      val ev = Tables.spread(s, d, "events").select(
        try_element_at(from_json(col("props"), MapType(StringType, StringType)), lit("k"))
          .cast("long").as("ref_id"),
        col("value"))
      ev.join(broadcast(feats), col("ref_id") === col("doc_id"))
        .groupBy("lang", "label")
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double").as("total_value"),
          (sum(col("l2").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
            .cast("double") / count(lit(1))).as("avg_l2"))
        .orderBy("lang", "label")
    }.copy(headline = true),

    // Binary media decode, FULLY oracled (VERDICT r11 task 4): the fake
    // decode is deterministic arithmetic — a 31-polynomial hash with
    // 64-bit wraparound — so DuckDB can replay it exactly: bytes come
    // off hex(encode(text)) two chars at a time, the reduce runs in
    // HUGEINT mod 2^64, and the unsigned→signed reinterpretation at the
    // end reproduces Java's long overflow bit-for-bit. The Spark side
    // still runs the REAL pipeline (typed mapPartitions over binary
    // payloads); only the oracle is expressed arithmetically.
    Q("multimodal_media_features",
      """WITH b AS (
        |  SELECT doc_id,
        |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
        |    hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, media_type, n,
        |    list_reduce(
        |      list_prepend(1125899906842597::HUGEINT,
        |        list_transform(range(0, n), i ->
        |          ((strpos('0123456789ABCDEF', substring(hx, 2*i+1, 1)) - 1) * 16 +
        |           (strpos('0123456789ABCDEF', substring(hx, 2*i+2, 1)) - 1))::HUGEINT)),
        |      (a, x) -> (a * 31 + x) % 18446744073709551616::HUGEINT) AS hu
        |  FROM b)
        |SELECT doc_id, media_type, CAST(n AS INT) AS n_bytes,
        |  CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
        |       THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT) AS checksum,
        |  16 + CAST(hu % 240 AS INT) AS width,
        |  16 + CAST((hu // 256) % 240 AS INT) AS height
        |FROM h ORDER BY doc_id""".stripMargin) { (s, d) =>
      mediaFeatures(asMedia(Tables.documents(s, d))).toDF().orderBy("doc_id")
    },

    // X15+: stubbed resize — fixed 16×16 output payload per doc. The
    // metadata projection is oracled (payload resample itself is pinned
    // byte-for-byte in MultimodalSpec; the registry dump drops the
    // binary column, as for every binary-emitting query).
    Q("multimodal_resize",
      """SELECT doc_id,
        |  (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
        |  16 AS width, 16 AS height,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes_in
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      resizeMedia(asMedia(Tables.documents(s, d)), 16, 16)
        .toDF().select("doc_id", "media_type", "width", "height", "n_bytes_in")
        .orderBy("doc_id")
    },

    // X15+: stubbed frame sampling over the "video" third of the
    // corpus, oracled the same way as media_features — every 4th
    // 256-byte frame, per-frame polynomial checksum replayed over the
    // matching hex slice.
    Q("multimodal_frame_sample",
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        |  FROM documents
        |  WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT doc_id, hx, CAST(u.i AS INT) AS frame_no,
        |    CAST(least(256, n - u.i * 256) AS INT) AS n_bytes
        |  FROM b, unnest(range(0, CAST(ceil(n / 256.0) AS BIGINT))) AS u(i)
        |  WHERE u.i % 4 = 0),
        |h AS (
        |  SELECT doc_id, frame_no, n_bytes,
        |    list_reduce(
        |      list_prepend(1125899906842597::HUGEINT,
        |        list_transform(range(0, n_bytes), j ->
        |          ((strpos('0123456789ABCDEF', substring(hx, 2*(frame_no*256 + j)+1, 1)) - 1) * 16 +
        |           (strpos('0123456789ABCDEF', substring(hx, 2*(frame_no*256 + j)+2, 1)) - 1))::HUGEINT)),
        |      (a, x) -> (a * 31 + x) % 18446744073709551616::HUGEINT) AS hu
        |  FROM f)
        |SELECT doc_id, frame_no, n_bytes,
        |  CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
        |       THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT) AS checksum
        |FROM h ORDER BY doc_id, frame_no""".stripMargin) { (s, d) =>
      sampleFrames(asMedia(Tables.documents(s, d)))
        .toDF().orderBy("doc_id", "frame_no")
    }
  )
}
