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
    // frames/byte_hist are JSON-encoded in the DECLARED outputs only (the
    // driver's canonicalizer cannot sort/hash raw array cells); the library
    // operators keep their typed array columns.
    "m2_frame_sample" -> ((s, dir) =>
      media(s, dir).select(
        col("media_id"),
        Multimodal.sampleFrames(col("bytes"), 7).as("frames"))
        .select(col("media_id"),
          to_json(col("frames")).as("frames_json"),
          size(col("frames")).cast("long").as("n_frames"))),
    "m3_decode_features" -> ((s, dir) =>
      Multimodal.decodeFeatures(media(s, dir)).toDF()
        .select(col("media_id"), col("n_bytes"), col("mean_byte"),
          to_json(col("byte_hist")).as("byte_hist_json"))),
    // m4/m5 — the REAL codecs: generated PNG/BMP (javax.imageio) and WAV
    // (RIFF/PCM16) whose pixel/sample values are closed-form in
    // (id, position), so the oracle replays the DECODED stats as pure
    // integer arithmetic — a hash match proves the actual encode→decode
    // round-trip, not a stub.
    "m4_decode_image" -> ((s, dir) =>
      Multimodal.decodeMedia(Multimodal.syntheticImages(
          Tables.documents(s, dir).select(col("doc_id").as("media_id")))).toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("n_samples"), col("sum_r"), col("sum_g"), col("sum_b"))),
    "m5_decode_audio" -> ((s, dir) =>
      Multimodal.decodeMedia(Multimodal.syntheticWavs(
          Tables.documents(s, dir).select(col("doc_id").as("media_id")))).toDF()
        .select(col("media_id"), col("sample_rate"), col("n_channels"),
          col("n_samples"), col("sum_pcm")))
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
        |       CAST(to_json(CASE WHEN length(text) >= 7
        |            THEN list_transform(generate_series(1, length(text) // 7),
        |                   i -> CAST(ascii(substring(text, (i - 1) * 7 + 1, 1)) AS BIGINT))
        |            ELSE CAST([] AS BIGINT[]) END) AS VARCHAR) AS frames_json,
        |       CAST(CASE WHEN length(text) >= 7 THEN length(text) // 7 ELSE 0 END AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,
    // m3: the "decode" stub is deterministic byte arithmetic and the corpus is
    // pure ASCII, so the DuckDB mirror reproduces it exactly — full hash check.
    "m3_decode_features" ->
      """WITH b AS (
        |  SELECT doc_id, unnest(generate_series(1, length(text))) AS i, text
        |  FROM documents
        |),
        |bytes AS (SELECT doc_id, ascii(substring(text, i, 1)) AS byte FROM b),
        |sums AS (
        |  SELECT doc_id, count(*) AS n, CAST(sum(byte) AS DOUBLE) / count(*) AS mean_byte
        |  FROM bytes GROUP BY doc_id
        |),
        |counts AS (
        |  SELECT doc_id, byte // 16 AS bin, count(*) AS c FROM bytes GROUP BY 1, 2
        |),
        |hist AS (
        |  SELECT d.doc_id, k, CAST(coalesce(c.c, 0) AS BIGINT) AS c
        |  FROM documents d
        |  CROSS JOIN generate_series(0, 15) g(k)
        |  LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.bin = k
        |),
        |hl AS (SELECT doc_id, list(c ORDER BY k) AS byte_hist FROM hist GROUP BY doc_id)
        |SELECT d.doc_id AS media_id,
        |       CAST(length(d.text) AS BIGINT) AS n_bytes,
        |       coalesce(s.mean_byte, CAST(0 AS DOUBLE)) AS mean_byte,
        |       CAST(to_json(h.byte_hist) AS VARCHAR) AS byte_hist_json
        |FROM documents d
        |LEFT JOIN sums s ON s.doc_id = d.doc_id
        |LEFT JOIN hl h ON h.doc_id = d.doc_id""".stripMargin,
    // m4/m5: the generator's pixel/sample formulas replayed as integer
    // arithmetic — a hash match proves javax.imageio (m4) / the RIFF+PCM
    // walk (m5) decoded the real containers bit-exactly.
    "m4_decode_image" ->
      """WITH dims AS (
        |  SELECT doc_id, CAST(doc_id % 24 + 4 AS INTEGER) AS w,
        |         CAST(doc_id % 16 + 4 AS INTEGER) AS h
        |  FROM documents
        |), xs AS (
        |  SELECT doc_id, w, h,
        |         unnest(generate_series(0, CAST(w AS BIGINT) - 1)) AS x
        |  FROM dims
        |), px AS (
        |  SELECT doc_id, w, h, x,
        |         unnest(generate_series(0, CAST(h AS BIGINT) - 1)) AS y
        |  FROM xs
        |)
        |SELECT doc_id AS media_id, w AS width, h AS height,
        |       CAST(w AS BIGINT) * h AS n_samples,
        |       CAST(sum((doc_id + x + y) % 256) AS BIGINT) AS sum_r,
        |       CAST(sum((doc_id + 2 * x + y) % 256) AS BIGINT) AS sum_g,
        |       CAST(sum((doc_id + x + 2 * y) % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id, w, h""".stripMargin,
    "m5_decode_audio" ->
      """WITH p AS (
        |  SELECT doc_id, CAST(doc_id % 100 + 50 AS INTEGER) AS n,
        |         CAST(8000 + (doc_id % 8) * 1000 AS INTEGER) AS rate
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, n, rate,
        |         unnest(generate_series(0, CAST(n AS BIGINT) - 1)) AS i
        |  FROM p
        |)
        |SELECT doc_id AS media_id, rate AS sample_rate,
        |       CAST(1 AS INTEGER) AS n_channels,
        |       CAST(n AS BIGINT) AS n_samples,
        |       CAST(sum((doc_id * 31 + i * 7) % 65536 - 32768) AS BIGINT) AS sum_pcm
        |FROM s GROUP BY doc_id, rate, n""".stripMargin
  )
}
