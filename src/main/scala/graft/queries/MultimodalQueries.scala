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

    "mm_features" -> ((s, dir) =>
      Multimodal.extractFeatures(Multimodal.mediaFromDocuments(s, dir))
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"), col("feature"))
        .orderBy("media_id")),

    "mm_frames" -> ((s, dir) =>
      Multimodal.frameSample(Multimodal.mediaFromDocuments(s, dir))
        .toDF()
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"), min(col("frame_hash")).as("first_hash"))
        .orderBy("media_id")))

  val oracleSql: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS content_hash,
        |  lower(hex(substr(text, 1, 4))) AS magic
        |FROM documents ORDER BY media_id""".stripMargin)
}
