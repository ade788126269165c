package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing queries. `mm_meta` is oracle-checked (pure SQL
  * metadata, never touches media bytes — the 100-TB fast path);
  * `mm_features` / `mm_frames` exercise the batched mapPartitions decode
  * stub and frame-sampling explode (rows-only check; the decode is a
  * deterministic fake, see Multimodal scaladoc).
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> ((s, dir) =>
      Multimodal.mediaMeta(s, dir).orderBy("media_id")),

    // NOTE: the query output carries scalar DIGESTS of the feature
    // vector, not the raw array — the driver's compare sorts the output
    // by every column and cannot sort array cells. The full Array[Float]
    // pipeline still runs (digests are computed FROM it).
    "mm_features" -> ((s, dir) =>
      Multimodal.extractFeatures(Multimodal.mediaFromDocuments(s, dir))
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"),
          size(col("feature")).as("feat_dim"),
          round(aggregate(col("feature"), lit(0.0d),
            (acc, x) => acc + x.cast("double")) * 1e6).cast("long").as("feat_l1_1e6"),
          round(array_max(col("feature")).cast("double") * 1e6).cast("long")
            .as("feat_max_1e6"))
        .orderBy("media_id")),

    "mm_frames" -> ((s, dir) =>
      Multimodal.frameSample(Multimodal.mediaFromDocuments(s, dir))
        .toDF()
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"), min(col("frame_hash")).as("first_hash"))
        .orderBy("media_id")),

    // batched resize pass (stub decimation — the binary-in/binary-out
    // map shape; rows-only like the other stub-decode paths)
    "mm_resize" -> ((s, dir) =>
      Multimodal.resize(Multimodal.mediaFromDocuments(s, dir), targetLen = 64)
        .toDF()
        .select(col("media_id"), col("kind"),
          octet_length(col("content")).as("resized_len"),
          md5(col("content")).as("resized_md5"), col("meta_len"))
        .orderBy("media_id")))

  val oracleSql: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS content_hash,
        |  lower(hex(substr(text, 1, 4))) AS magic
        |FROM documents ORDER BY media_id""".stripMargin)
}
