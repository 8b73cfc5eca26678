package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{OracleSql => O}
import graft.sources.Tables

/** Declared-query catalog for the composed corpus pipeline
  * ([[CorpusPipeline]]): the four-stage hygiene chain as ONE oracle-gated
  * query. The oracle replays the entire chain — quality verdict, digest
  * dedup, n-gram decontamination, token packing — as a single CTE pipeline,
  * so a drift in ANY stage (or in how the stages hand rows to each other)
  * breaks the hash.
  */
object CorpusQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_corpus_pipeline" -> ((s, dir) =>
      CorpusPipeline.run(Tables.documents(s, dir), col("text"), col("doc_id"),
        benchResidue = 97, n = 3, contaminationThreshold = 0.05, budget = 256L))
  )

  /** Word 3-gram set over `tk` (the dc1 construction). */
  private val gram3SetSql =
    """list_distinct(CASE WHEN len(tk) >= 3
      |  THEN list_transform(generate_series(1, len(tk) - 2),
      |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
      |  ELSE [] END)""".stripMargin

  val oracle: Map[String, String] = Map(
    "c1_corpus_pipeline" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source, text, ${O.tokens("text")} AS tk FROM documents
         |), kept AS (
         |  SELECT doc_id, source, text, tk FROM toks
         |  WHERE doc_id % 97 != 0 AND ${TextQueries.verdictSql} = 'keep'
         |), ded AS (
         |  SELECT doc_id, source, text, tk FROM (
         |    SELECT *, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
         |    FROM kept)
         |  WHERE rn = 1
         |), gsets AS (
         |  SELECT doc_id, $gram3SetSql AS gset FROM ded
         |), g AS (
         |  SELECT doc_id, len(gset) AS n_grams, unnest(gset) AS gs FROM gsets
         |), gh AS (
         |  SELECT doc_id, n_grams, ${O.tokenHash("gs")} AS ghash FROM g
         |), bench AS (
         |  SELECT DISTINCT ${O.tokenHash("gs")} AS ghash FROM (
         |    SELECT unnest($gram3SetSql) AS gs
         |    FROM (SELECT ${O.tokens("text")} AS tk FROM documents WHERE doc_id % 97 = 0))
         |), flagged AS (
         |  SELECT doc_id FROM gh JOIN bench USING (ghash)
         |  GROUP BY doc_id, n_grams
         |  HAVING CAST(count(*) AS DOUBLE) / CAST(n_grams AS DOUBLE) >= CAST('0.05' AS DOUBLE)
         |), clean AS (
         |  SELECT doc_id, source, CAST(len(tk) AS INTEGER) AS n_tokens FROM ded
         |  WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
         |), pre AS (
         |  SELECT doc_id, source, n_tokens,
         |         CAST(COALESCE(SUM(n_tokens) OVER (
         |           PARTITION BY source ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pb
         |  FROM clean
         |)
         |SELECT doc_id, source, n_tokens,
         |       pb // 256 AS bin_id, pb % 256 AS bin_offset
         |FROM pre""".stripMargin
  )
}
