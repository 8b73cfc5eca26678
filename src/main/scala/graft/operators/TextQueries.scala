package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{OracleSql => O}
import graft.sources.Tables

/** Declared-query catalog for the text-analysis operators ([[TextOps]]) on
  * the `documents` table: language ID, quality scoring, token counting,
  * fingerprinting. Every expression mirrors its DuckDB oracle shape
  * (integer-ratio doubles, md5-derived hashes).
  */
object TextQueries {

  private val stopList = TextOps.EnStopwords.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Shared CTE: per-doc token list. */
  private val toksSql =
    s"WITH toks AS (SELECT doc_id, text, n_chars, ${O.tokens("text")} AS tk FROM documents)"

  private val stopRatioSql =
    s"CASE WHEN len(tk) > 0 THEN CAST(len(list_filter(tk, t -> t IN $stopList)) AS DOUBLE) / CAST(len(tk) AS DOUBLE) ELSE CAST(0 AS DOUBLE) END"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_lang_id" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.stopwordRatio(col("text")).as("stop_ratio"),
        TextOps.langId(col("text")).as("lang_pred"))),
    "x2_quality_score" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.qualityScore(col("text")).as("quality"))),
    "x3_token_counts" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_ws_tokens"),
        TextOps.subwordCount(col("text")).as("n_subwords"),
        col("n_chars"))),
    "x4_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"))),
    "x5_normalized_fp" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextOps.normalizeText(col("text")).as("norm_text"),
        TextOps.fingerprint(TextOps.normalizeText(col("text"))).as("fp")))
  )

  val oracle: Map[String, String] = Map(
    "x1_lang_id" -> (toksSql +
      s"""
         |SELECT doc_id, stop_ratio,
         |       CASE WHEN stop_ratio >= CAST('0.05' AS DOUBLE) THEN 'en' ELSE 'unk' END AS lang_pred
         |FROM (SELECT doc_id, $stopRatioSql AS stop_ratio FROM toks)""".stripMargin),
    "x2_quality_score" -> (toksSql +
      s"""
         |SELECT doc_id,
         |       CASE WHEN CAST(len(tk) AS DOUBLE) > 0 THEN
         |         (least(CAST(1 AS DOUBLE), CAST(len(tk) AS DOUBLE) / CAST(50 AS DOUBLE))
         |          + CAST(len(list_filter(tk, t -> regexp_matches(t, '^[a-z]+$$'))) AS DOUBLE) / CAST(len(tk) AS DOUBLE)
         |          + CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE)
         |          + (CAST(1 AS DOUBLE) - abs($stopRatioSql - CAST('0.4' AS DOUBLE))))
         |         * CAST('0.25' AS DOUBLE)
         |       ELSE CAST(0 AS DOUBLE) END AS quality
         |FROM toks""".stripMargin),
    "x3_token_counts" -> (toksSql +
      """
        |SELECT doc_id,
        |       CAST(len(tk) AS INTEGER) AS n_ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_subwords,
        |       n_chars
        |FROM toks""".stripMargin),
    "x4_fingerprint" -> (toksSql +
      s"""
         |SELECT doc_id,
         |       list_reduce(
         |         list_prepend(CAST(0 AS BIGINT),
         |           list_transform(tk, t -> ${O.tokenHash("t")} % 2147483647)),
         |         (a, b) -> (a * 31 + b) % 2147483647) AS fp
         |FROM toks""".stripMargin),
    "x5_normalized_fp" ->
      s"""WITH norm AS (
         |  SELECT doc_id,
         |         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
         |  FROM documents
         |), ntoks AS (
         |  SELECT doc_id, norm_text, ${O.tokens("norm_text")} AS tk FROM norm
         |)
         |SELECT doc_id, norm_text,
         |       list_reduce(
         |         list_prepend(CAST(0 AS BIGINT),
         |           list_transform(tk, t -> ${O.tokenHash("t")} % 2147483647)),
         |         (a, b) -> (a * 31 + b) % 2147483647) AS fp
         |FROM ntoks""".stripMargin
  )
}
