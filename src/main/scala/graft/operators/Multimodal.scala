package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (training-data-pipeline extension surface).
  *
  * Media assets are opaque `binary` columns with typed metadata — the
  * pattern a 100-TB multimodal corpus uses: the bytes stay a black box to
  * the planner (never a join/filter key), metadata columns drive
  * partition pruning, and decode/feature-extraction runs as batched
  * per-partition compute so codec state is reused across records.
  *
  * The decoders themselves are STUBS (this container has no image/audio
  * codecs): [[decodeStub]]/[[featureStub]] produce deterministic fakes.
  * Everything Spark-side — schema, Dataset encoders, batched
  * mapPartitions shape, frame-sampling explode — is real and tested.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      meta_len: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      feature: Array[Float])

  final case class Frame(media_id: Long, frame_idx: Int, frame_hash: String)

  /** STUB — stands in for a real image/audio decoder (`???` per the
    * builder contract): derives fake dimensions deterministically from
    * the byte content. A real deployment swaps only this function.
    */
  def decodeStub(kind: String, content: Array[Byte]): (Int, Int) = {
    val n = content.length
    kind match {
      case "image" => (64 + n % 192, 64 + (n / 7) % 192)
      case "audio" => (n * 8, 1) // samples × mono
      case _       => (320, 240)
    }
  }

  /** STUB feature extractor: 8-bin byte histogram, L1-normalized —
    * deterministic, fixed-dim, same shape a real embedding would have.
    */
  def featureStub(content: Array[Byte], dim: Int = 8): Array[Float] = {
    val bins = new Array[Float](dim)
    var i = 0
    while (i < content.length) {
      bins(((content(i) & 0xff) * dim) / 256) += 1f
      i += 1
    }
    val total = math.max(1f, content.length.toFloat)
    bins.map(_ / total)
  }

  /** Synthesize a media table from `documents` (the fixtures carry no
    * real media): bytes = UTF-8 text, kind round-robins by doc_id. The
    * point is the plumbing, not the pixels.
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + lit(1)).cast("int")).as("kind"),
        col("text").cast("binary").as("content"),
        length(col("text")).as("meta_len"))
      .as[MediaRecord]
  }

  /** Batched decode + feature extraction: mapPartitions with explicit
    * micro-batches (grouped iterator) — the shape that amortizes codec
    * init; at scale each partition holds many assets and the stage is
    * narrow (no shuffle).
    */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real impl would decode the whole batch through one codec
        batch.map { m =>
          val (w, h) = decodeStub(m.kind, m.content)
          MediaFeatures(m.media_id, m.kind, m.content.length, w, h,
            featureStub(m.content))
        }
      }
    }
  }

  /** STUB resize: deterministic decimation of the byte stream to
    * `targetLen` bytes (stands in for image resampling — a real impl
    * decodes, resizes, re-encodes). Keeps the map-shaped contract:
    * binary in → smaller binary out, metadata updated.
    */
  def resizeStub(content: Array[Byte], targetLen: Int): Array[Byte] = {
    if (content.length <= targetLen) content
    else {
      val out = new Array[Byte](targetLen)
      var i = 0
      while (i < targetLen) {
        out(i) = content((i.toLong * content.length / targetLen).toInt)
        i += 1
      }
      out
    }
  }

  /** Batched resize over media records (same mapPartitions shape as
    * extractFeatures).
    */
  def resize(ds: Dataset[MediaRecord], targetLen: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(m =>
      m.copy(content = resizeStub(m.content, targetLen),
        meta_len = math.min(m.meta_len, targetLen))))
  }

  /** Frame sampling for `video` records: every `stride` bytes becomes a
    * "frame" (stub for keyframe extraction); one output row per sampled
    * frame — the explode-shaped transform a video pipeline needs.
    */
  def frameSample(ds: Dataset[MediaRecord], stride: Int = 64): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "video").flatMap { m =>
      m.content.grouped(stride).zipWithIndex.map { case (chunk, i) =>
        Frame(m.media_id, i, java.security.MessageDigest.getInstance("MD5")
          .digest(chunk).map("%02x".format(_)).mkString)
      }
    }
  }

  /** Metadata-only view — pure SQL functions, oracle-checkable: at scale
    * this is the query that runs WITHOUT touching the media bytes.
    */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      octet_length(col("text")).as("n_bytes"),
      md5(col("text")).as("content_hash"),
      lower(hex(substring(col("text"), 1, 4))).as("magic"))
}
