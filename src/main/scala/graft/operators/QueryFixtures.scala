package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Shared cleaned-bars fixture for the declared-query catalogs: bars
  * deduplicated on (symbol, ts) keeping the lowest event_id, with close
  * ffill+bfill — i.e. the reference pipeline's state right before
  * resample/indicator stages. (symbol, ts) is unique afterwards, so
  * `min_by`/`max_by`(…, ts) and DuckDB `arg_min`/`arg_max`(…, ts) are
  * deterministic.
  */
object QueryFixtures {

  def dbars(s: SparkSession, dir: String): DataFrame = {
    val order = Seq(col("ts"), col("event_id"))
    val d = Cleaning.dedupKeepFirstSeries(Tables.bars(s, dir),
      Seq("symbol"), col("ts"), Seq(col("event_id")))
    Cleaning.bfill(
      Cleaning.ffill(d, Seq("close"), Seq("symbol"), order),
      Seq("close"), Seq("symbol"), order)
  }

  private val W = "PARTITION BY symbol ORDER BY ts, event_id"

  /** DuckDB CTE mirror of [[dbars]]; prepend to oracle SQL. */
  val dbarsSql: String = Tables.barsSql +
    s""", dbars0 AS (
       |  SELECT event_id, symbol, ts, open, high, low, close, volume
       |  FROM (SELECT *, row_number() OVER (PARTITION BY symbol, ts ORDER BY event_id) AS __rn FROM bars)
       |  WHERE __rn = 1
       |), dbars AS (
       |  SELECT event_id, symbol, ts, open, high, low,
       |         coalesce(
       |           last_value(close IGNORE NULLS) OVER ($W
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |           first_value(close IGNORE NULLS) OVER ($W
       |             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS close,
       |         volume
       |  FROM dbars0
       |)""".stripMargin
}
