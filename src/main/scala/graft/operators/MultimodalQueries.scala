package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Declared-query catalog for the multimodal plumbing ([[Multimodal]]).
  * The testdata documents are pure ASCII (verified: octet_length(encode(t))
  * == length(t) for every row), so DuckDB string ops mirror Spark binary
  * ops byte-for-byte. m3 (the decode stub) has no SQL mirror — the driver
  * records a rows-only check; its semantics are covered by MultimodalSpec.
  */
object MultimodalQueries {

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.toMediaTable(Tables.documents(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_meta" -> ((s, dir) =>
      media(s, dir).select(
        col("media_id"),
        length(col("bytes")).cast("long").as("n_bytes"),
        sha2(col("bytes"), 256).as("content_sha"),
        lower(hex(substring(col("bytes"), 1, 8))).as("head8"),
        col("meta.mime").as("mime"),
        col("meta.width").as("width"),
        col("meta.height").as("height"))),
    "m2_frame_sample" -> ((s, dir) =>
      media(s, dir).select(
        col("media_id"),
        Multimodal.sampleFrames(col("bytes"), 7).as("frames"))
        .withColumn("n_frames", size(col("frames")).cast("long"))),
    "m3_decode_features" -> ((s, dir) =>
      Multimodal.decodeFeatures(media(s, dir)).toDF()
        .select(col("media_id"), col("n_bytes"), col("mean_byte"), col("byte_hist")))
  )

  val oracle: Map[String, String] = Map(
    "m1_media_meta" ->
      """SELECT doc_id AS media_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       sha256(text) AS content_sha,
        |       lower(hex(substring(text, 1, 8))) AS head8,
        |       'text/plain' AS mime,
        |       CAST(n_chars % 640 + 1 AS INTEGER) AS width,
        |       CAST(n_chars % 480 + 1 AS INTEGER) AS height
        |FROM documents""".stripMargin,
    "m2_frame_sample" ->
      """SELECT doc_id AS media_id,
        |       CASE WHEN length(text) >= 7
        |            THEN list_transform(generate_series(1, length(text) // 7),
        |                   i -> CAST(ascii(substring(text, (i - 1) * 7 + 1, 1)) AS BIGINT))
        |            ELSE [] END AS frames,
        |       CAST(CASE WHEN length(text) >= 7 THEN length(text) // 7 ELSE 0 END AS BIGINT) AS n_frames
        |FROM documents""".stripMargin
    // m3_decode_features: decode stub — no SQL mirror (rows-only check)
  )
}
