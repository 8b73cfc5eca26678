package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{epochUs, OracleSql => O}
import graft.sources.Tables

/** Declared-query catalog for the §2.2-§2.3 cleaning operators: each entry is
  * (DataFrame program, DuckDB oracle SQL) over the shared testdata tables.
  * Column names and float expression trees mirror each other exactly.
  */
object CleaningQueries {

  private def bars(s: SparkSession, dir: String): DataFrame = Tables.bars(s, dir)

  private val ohlcInvalidSql =
    """coalesce(high < low OR high < open OR high < close OR low > open OR low > close, false)"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f3_coerce" -> ((s, dir) => {
      val dirty = Tables.events(s, dir).select(
        col("event_id"),
        when(col("event_id") % 97 === 0, lit("N/A"))
          .otherwise(col("value").cast("string")).as("raw"))
      Cleaning.coerceNumeric(dirty, Seq("raw"))
        .select(col("event_id"), col("raw").as("parsed"))
    }),
    "f4_dedup_keep_first" -> ((s, dir) =>
      Cleaning.dedupKeepFirst(Tables.events(s, dir),
          Seq("user_id", "event_type"), Seq(col("ts"), col("event_id")))
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))),
    "f5_nonneg_filter" -> ((s, dir) =>
      Cleaning.filterNonNegative(bars(s, dir))
        .select("event_id", "symbol", "open", "close", "volume")),
    "f6_ohlc_invalid_count" -> ((s, dir) =>
      bars(s, dir).groupBy("symbol")
        .agg(sum(when(Cleaning.ohlcInvalid(), 1L).otherwise(0L)).as("n_invalid"),
          count(lit(1)).as("n_rows"))),
    "f7_ohlc_repair" -> ((s, dir) =>
      Cleaning.repairOhlc(bars(s, dir))
        .select("event_id", "open", "high", "low", "close")),
    "f8_ffill_bfill" -> ((s, dir) => {
      val filled = Cleaning.bfill(
        Cleaning.ffill(bars(s, dir), Seq("close"), Seq("symbol"), Seq(col("ts"), col("event_id"))),
        Seq("close"), Seq("symbol"), Seq(col("ts"), col("event_id")))
      filled.select(col("event_id"), col("symbol"), col("close").as("close_filled"))
    }),
    "f9_time_range" -> ((s, dir) =>
      Cleaning.timeRange(Tables.events(s, dir), "ts", "2024-01-10 00:00:00", "2024-01-20 00:00:00")
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))),
    "f10_ts_parse_drop" -> ((s, dir) => {
      val dirty = Tables.events(s, dir).select(
        col("event_id"),
        when(col("event_id") % 89 === 0, lit("not-a-timestamp"))
          .otherwise(col("ts").cast("string")).as("raw_ts"))
      Cleaning.dropInvalidTimestamps(
        Cleaning.parseTimestamp(dirty, "raw_ts"), "raw_ts")
        .select(col("event_id"), epochUs(col("raw_ts")).as("ts_us"))
    }),
    "o1_iqr_clip" -> ((s, dir) =>
      Cleaning.iqrClip(bars(s, dir), Seq("open", "volume"), k = 1.5)
        .select("event_id", "open", "volume")),
    "o2_iqr_flag" -> ((s, dir) => {
      val f = Cleaning.iqrFlag(bars(s, dir), Seq("open", "volume"), k = 3.0)
      f.agg(
        sum(when(col("open_outlier"), 1L).otherwise(0L)).as("n_open_outliers"),
        sum(when(col("volume_outlier"), 1L).otherwise(0L)).as("n_volume_outliers"),
        count(lit(1)).as("n_rows"))
    }),
    "o3_zscore_nullify" -> ((s, dir) =>
      Cleaning.zscoreNullify(bars(s, dir), Seq("open"), t = 3.0)
        .select("event_id", "open")),
    "o4_extreme_change" -> ((s, dir) =>
      Cleaning.extremeChange(bars(s, dir), "close", Seq("symbol"),
          Seq(col("ts"), col("event_id")), t = 0.2)
        .groupBy("symbol")
        .agg(sum(when(col("extreme_change"), 1L).otherwise(0L)).as("n_extreme"))),
    "o5_zero_checks" -> ((s, dir) =>
      bars(s, dir).groupBy("symbol").agg(
        sum(when(col("open") === 0 || col("high") === 0 || col("low") === 0 || col("close") === 0, 1L)
          .otherwise(0L)).as("n_zero_price"),
        sum(when(col("volume") === 0, 1L).otherwise(0L)).as("n_zero_volume"))),
    "o6_time_gaps" -> ((s, dir) =>
      Cleaning.timeGaps(bars(s, dir), "ts", Seq("symbol"), Seq(col("ts"), col("event_id")))
        .groupBy("symbol")
        .agg(sum(when(col("is_gap"), 1L).otherwise(0L)).as("n_gaps"),
          count(col("interval_us")).as("n_intervals"))),
    "o7_quality_score" -> ((s, dir) =>
      Cleaning.qualityScore(bars(s, dir), Seq("symbol"), Seq(col("ts"), col("event_id")))),
    "clean_pipeline" -> ((s, dir) => {
      val order = Seq(col("ts"), col("event_id"))
      val deduped = Cleaning.dedupKeepFirstSeries(bars(s, dir),
        Seq("symbol"), col("ts"), Seq(col("event_id")))
      val filled = Cleaning.bfill(
        Cleaning.ffill(deduped, Seq("close"), Seq("symbol"), order),
        Seq("close"), Seq("symbol"), order)
      val nonneg = Cleaning.filterNonNegative(filled)
      val repaired = Cleaning.repairOhlc(nonneg)
      Cleaning.addTimeFeatures(repaired, "ts")
        .select(col("event_id"), col("symbol"), epochUs(col("ts")).as("ts_us"),
          col("open"), col("high"), col("low"), col("close"), col("volume"),
          col("hour"), col("day_of_week"), col("month"), col("year"))
    })
  )

  private def winParts(partition: String, order: String): String =
    s"PARTITION BY $partition ORDER BY $order"

  val oracle: Map[String, String] = Map(
    "f3_coerce" ->
      """SELECT event_id,
        |       TRY_CAST(CASE WHEN event_id % 97 = 0 THEN 'N/A'
        |                     ELSE CAST(value AS VARCHAR) END AS DOUBLE) AS parsed
        |FROM events""".stripMargin,
    "f4_dedup_keep_first" ->
      """SELECT event_id, user_id, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |                                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin,
    "f5_nonneg_filter" -> (Tables.barsSql +
      """
        |SELECT event_id, symbol, open, close, volume FROM bars
        |WHERE (open IS NULL OR open >= 0) AND (high IS NULL OR high >= 0)
        |  AND (low IS NULL OR low >= 0) AND (close IS NULL OR close >= 0)
        |  AND (volume IS NULL OR volume >= 0)""".stripMargin),
    "f6_ohlc_invalid_count" -> (Tables.barsSql +
      s"""
         |SELECT symbol,
         |       CAST(sum(CASE WHEN $ohlcInvalidSql THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid,
         |       count(*) AS n_rows
         |FROM bars GROUP BY symbol""".stripMargin),
    "f7_ohlc_repair" -> (Tables.barsSql +
      s"""
         |SELECT event_id, open,
         |       CASE WHEN $ohlcInvalidSql
         |            THEN greatest(open, coalesce(close, open), high) ELSE high END AS high,
         |       CASE WHEN $ohlcInvalidSql
         |            THEN least(open, coalesce(close, open), low) ELSE low END AS low,
         |       close
         |FROM bars""".stripMargin),
    "f8_ffill_bfill" -> (Tables.barsSql +
      s"""
         |SELECT event_id, symbol,
         |       coalesce(
         |         last_value(close IGNORE NULLS) OVER (${winParts("symbol", "ts, event_id")}
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |         first_value(close IGNORE NULLS) OVER (${winParts("symbol", "ts, event_id")}
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS close_filled
         |FROM bars""".stripMargin),
    "f9_time_range" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) BETWEEN TIMESTAMP '2024-01-10 00:00:00'
        |                                AND TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,
    "f10_ts_parse_drop" ->
      """SELECT event_id,
        |       epoch_us(TRY_CAST(CASE WHEN event_id % 89 = 0 THEN 'not-a-timestamp'
        |                              ELSE CAST(CAST(ts AS TIMESTAMP) AS VARCHAR) END
        |                         AS TIMESTAMP)) AS ts_us
        |FROM events
        |WHERE TRY_CAST(CASE WHEN event_id % 89 = 0 THEN 'not-a-timestamp'
        |               ELSE CAST(CAST(ts AS TIMESTAMP) AS VARCHAR) END AS TIMESTAMP) IS NOT NULL""".stripMargin,
    "o1_iqr_clip" -> (Tables.barsSql +
      """, b AS (
        |  SELECT quantile_cont(open, 0.25) AS q1_open, quantile_cont(open, 0.75) AS q3_open,
        |         quantile_cont(volume, 0.25) AS q1_volume, quantile_cont(volume, 0.75) AS q3_volume
        |  FROM bars)
        |SELECT event_id,
        |       CASE WHEN open < q1_open - 1.5 * (q3_open - q1_open) THEN q1_open - 1.5 * (q3_open - q1_open)
        |            WHEN open > q3_open + 1.5 * (q3_open - q1_open) THEN q3_open + 1.5 * (q3_open - q1_open)
        |            ELSE open END AS open,
        |       CASE WHEN volume < q1_volume - 1.5 * (q3_volume - q1_volume) THEN q1_volume - 1.5 * (q3_volume - q1_volume)
        |            WHEN volume > q3_volume + 1.5 * (q3_volume - q1_volume) THEN q3_volume + 1.5 * (q3_volume - q1_volume)
        |            ELSE volume END AS volume
        |FROM bars CROSS JOIN b""".stripMargin),
    "o2_iqr_flag" -> (Tables.barsSql +
      """, b AS (
        |  SELECT quantile_cont(open, 0.25) AS q1_open, quantile_cont(open, 0.75) AS q3_open,
        |         quantile_cont(volume, 0.25) AS q1_volume, quantile_cont(volume, 0.75) AS q3_volume
        |  FROM bars)
        |SELECT CAST(sum(CASE WHEN open < q1_open - 3.0 * (q3_open - q1_open)
        |                  OR open > q3_open + 3.0 * (q3_open - q1_open) THEN 1 ELSE 0 END) AS BIGINT) AS n_open_outliers,
        |       CAST(sum(CASE WHEN volume < q1_volume - 3.0 * (q3_volume - q1_volume)
        |                  OR volume > q3_volume + 3.0 * (q3_volume - q1_volume) THEN 1 ELSE 0 END) AS BIGINT) AS n_volume_outliers,
        |       count(*) AS n_rows
        |FROM bars CROSS JOIN b""".stripMargin),
    "o3_zscore_nullify" -> (Tables.barsSql +
      s""", b AS (
         |  SELECT ${O.exactAvg("open")} AS mu, ${O.exactStdSamp("open")} AS sd FROM bars)
         |SELECT event_id,
         |       CASE WHEN abs(open - mu) / sd > 3.0 THEN NULL ELSE open END AS open
         |FROM bars CROSS JOIN b""".stripMargin),
    "o4_extreme_change" -> (Tables.barsSql +
      s"""
         |SELECT symbol,
         |       CAST(sum(CASE WHEN coalesce(abs(close / prev - 1) > 0.2, false) THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
         |FROM (SELECT symbol, close,
         |             lag(close, 1) OVER (${winParts("symbol", "ts, event_id")}) AS prev
         |      FROM bars)
         |GROUP BY symbol""".stripMargin),
    "o5_zero_checks" -> (Tables.barsSql +
      """
        |SELECT symbol,
        |       CAST(sum(CASE WHEN open = 0 OR high = 0 OR low = 0 OR close = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_price,
        |       CAST(sum(CASE WHEN volume = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_volume
        |FROM bars GROUP BY symbol""".stripMargin),
    "o6_time_gaps" -> (Tables.barsSql +
      s""", iv AS (
         |  SELECT symbol,
         |         epoch_us(ts) - lag(epoch_us(ts), 1) OVER (${winParts("symbol", "ts, event_id")}) AS interval_us
         |  FROM bars
         |), med AS (
         |  SELECT symbol, quantile_cont(interval_us, 0.5) AS med_iv FROM iv GROUP BY symbol)
         |SELECT iv.symbol,
         |       CAST(sum(CASE WHEN coalesce(interval_us > 6.0 * med_iv, false) THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
         |       count(interval_us) AS n_intervals
         |FROM iv JOIN med ON iv.symbol = med.symbol
         |GROUP BY iv.symbol""".stripMargin),
    "o7_quality_score" -> (Tables.barsSql +
      s"""
         |SELECT symbol,
         |       0.3 * CAST(sum(CASE WHEN open IS NOT NULL AND high IS NOT NULL AND low IS NOT NULL
         |                            AND close IS NOT NULL AND volume IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |             / CAST(count(*) AS DOUBLE)
         |       + 0.3 * CAST(sum(CASE WHEN NOT ($ohlcInvalidSql) THEN 1 ELSE 0 END) AS DOUBLE)
         |             / CAST(count(*) AS DOUBLE)
         |       + 0.2 * CAST(sum(CASE WHEN monotone THEN 1 ELSE 0 END) AS DOUBLE)
         |             / CAST(count(*) AS DOUBLE)
         |       + 0.2 * CAST(sum(CASE WHEN volume > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         |             / CAST(count(*) AS DOUBLE) AS quality_score,
         |       count(*) AS total_records
         |FROM (SELECT *,
         |             coalesce(epoch_us(ts) >= lag(epoch_us(ts), 1)
         |               OVER (${winParts("symbol", "ts, event_id")}), true) AS monotone
         |      FROM bars)
         |GROUP BY symbol""".stripMargin),
    "clean_pipeline" -> (Tables.barsSql +
      s""", dedup AS (
         |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY symbol, ts ORDER BY event_id) AS rn FROM bars)
         |  WHERE rn = 1
         |), filled AS (
         |  SELECT event_id, symbol, ts, open, high, low,
         |         coalesce(
         |           last_value(close IGNORE NULLS) OVER (${winParts("symbol", "ts, event_id")}
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |           first_value(close IGNORE NULLS) OVER (${winParts("symbol", "ts, event_id")}
         |             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS close,
         |         volume
         |  FROM dedup
         |), nonneg AS (
         |  SELECT * FROM filled
         |  WHERE (open IS NULL OR open >= 0) AND (high IS NULL OR high >= 0)
         |    AND (low IS NULL OR low >= 0) AND (close IS NULL OR close >= 0)
         |    AND (volume IS NULL OR volume >= 0)
         |), repaired AS (
         |  SELECT event_id, symbol, ts, open,
         |         CASE WHEN $ohlcInvalidSql
         |              THEN greatest(open, coalesce(close, open), high) ELSE high END AS high,
         |         CASE WHEN $ohlcInvalidSql
         |              THEN least(open, coalesce(close, open), low) ELSE low END AS low,
         |         close, volume
         |  FROM nonneg)
         |SELECT event_id, symbol, epoch_us(ts) AS ts_us, open, high, low, close, volume,
         |       CAST(hour(ts) AS INT) AS hour,
         |       CAST(isodow(ts) - 1 AS INT) AS day_of_week,
         |       CAST(month(ts) AS INT) AS month,
         |       CAST(year(ts) AS INT) AS year
         |FROM repaired""".stripMargin)
  )
}
