package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{epochUs, exactAvg, exactStdSamp, exactSum, OracleSql => O}
import graft.sources.Tables
import QueryFixtures.{dbars, dbarsSql}

/** Declared-query catalog for SURVEY §2.4 (aggregations A1-A12): resample
  * roll-ups plus the stats query library. Each entry mirrors its DuckDB
  * oracle expression-for-expression (exact decimal sums, deterministic
  * argmin/argmax on unique (symbol, ts)).
  */
object StatsQueries {

  private val usPerHour = 3600L * 1000000L
  private val usPer15m = 900L * 1000000L

  /** DuckDB mirror of the A1 OHLCV bucket aggregation over dbars. */
  private def aggSql(bucketUs: Long): String =
    s""", agg AS (
       |  SELECT symbol,
       |         make_timestamp((epoch_us(ts) // $bucketUs) * $bucketUs) AS bucket_ts,
       |         arg_min(open, ts) AS open, max(high) AS high, min(low) AS low,
       |         arg_max(close, ts) AS close,
       |         ${O.exactSum("volume")} AS volume, count(*) AS n_bars
       |  FROM dbars GROUP BY 1, 2
       |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_ohlcv_1h" -> ((s, dir) => Resample.ohlcv(dbars(s, dir), "1 hour")),
    "a1_ohlcv_15m_filled" -> ((s, dir) =>
      Resample.fillGaps(Resample.ohlcv(dbars(s, dir), "15 minutes"), "15 minutes")),
    "a1_ohlcv_month" -> ((s, dir) => Resample.ohlcvMonthly(dbars(s, dir))),
    // pandas-anchored frames: 3d from each symbol's start day, 1w W-SUN
    "a1_ohlcv_3d" -> ((s, dir) => Resample.ohlcvAnchored(dbars(s, dir), "3 days")),
    "a1_ohlcv_1w" -> ((s, dir) => Resample.ohlcvWeekly(dbars(s, dir))),
    "a3_symbol_stats" -> ((s, dir) =>
      dbars(s, dir).filter(col("symbol") === "click").agg(
        count(lit(1)).as("n_bars"),
        min(epochUs(col("ts"))).as("min_ts_us"),
        max(epochUs(col("ts"))).as("max_ts_us"),
        min("close").as("min_close"),
        max("close").as("max_close"),
        exactAvg(col("close")).as("avg_close"),
        exactSum(col("volume")).as("sum_volume"))),
    "a4_latest_ts" -> ((s, dir) =>
      Tables.bars(s, dir).groupBy("symbol")
        .agg(max(epochUs(col("ts"))).as("latest_ts_us"))),
    "a6_docs_by_source" -> ((s, dir) =>
      Tables.documents(s, dir).groupBy("source")
        .agg(count(lit(1)).as("n_docs"))),
    "a7_latest_order_status" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, dir)
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"),
          count(lit(1)).as("n_customers"))
    }),
    "a8_null_census" -> ((s, dir) => {
      val b = Tables.bars(s, dir)
      val cols = Seq("open", "high", "low", "close", "volume")
      val nullCounts = cols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null_$c"))
      b.agg(count(lit(1)).as("n_rows"), nullCounts: _*)
    }),
    "a9_date_range" -> ((s, dir) =>
      Tables.events(s, dir).agg(
        min(epochUs(col("ts"))).as("min_ts_us"),
        max(epochUs(col("ts"))).as("max_ts_us"),
        count(lit(1)).as("n_events"))),
    "a10_norm_stats" -> ((s, dir) =>
      dbars(s, dir).agg(
        exactAvg(col("open")).as("mu_open"),
        exactStdSamp(col("open")).as("sd_open"),
        min("open").as("min_open"),
        max("open").as("max_open"),
        exactAvg(col("volume")).as("mu_volume"),
        exactStdSamp(col("volume")).as("sd_volume"),
        min("volume").as("min_volume"),
        max("volume").as("max_volume"))),
    "a11_volume_profile" -> ((s, dir) => {
      val b = Cleaning.filterNonNegative(dbars(s, dir), Seq("volume"))
      val bounds = b.agg(min("close").as("__mn"), max("close").as("__mx"))
      b.crossJoin(broadcast(bounds))
        .withColumn("__w", (col("__mx") - col("__mn")) / lit(100.0))
        .withColumn("bucket",
          least(floor(try_divide(col("close") - col("__mn"), col("__w"))), lit(99.0)).cast("long"))
        .groupBy("bucket", "__mn", "__w")
        .agg(exactSum(col("volume")).as("bucket_volume"), count(lit(1)).as("n_bars"))
        .select(col("bucket"),
          (col("__mn") + (col("bucket").cast("double") + lit(0.5)) * col("__w")).as("bin_center"),
          col("bucket_volume"), col("n_bars"))
    }),
    "a12_meta_summary" -> ((s, dir) =>
      Tables.documents(s, dir).agg(
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("total_chars"),
        count(lit(1)).as("n_docs")))
  )

  val oracle: Map[String, String] = Map(
    "a1_ohlcv_1h" -> (dbarsSql + aggSql(usPerHour) +
      "\nSELECT symbol, bucket_ts, open, high, low, close, volume, n_bars FROM agg"),
    "a1_ohlcv_15m_filled" -> (dbarsSql + aggSql(usPer15m) +
      s""", cal AS (
         |  SELECT symbol, unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS bucket_ts
         |  FROM (SELECT symbol, min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM agg GROUP BY symbol) t
         |), j AS (
         |  SELECT cal.symbol AS symbol, cal.bucket_ts AS bucket_ts, agg.open AS o,
         |         agg.high AS h, agg.low AS l, agg.close AS c, agg.volume AS v, agg.n_bars AS n
         |  FROM cal LEFT JOIN agg ON cal.symbol = agg.symbol AND cal.bucket_ts = agg.bucket_ts
         |)
         |SELECT symbol, bucket_ts,
         |       last_value(o IGNORE NULLS) OVER win AS open,
         |       last_value(h IGNORE NULLS) OVER win AS high,
         |       last_value(l IGNORE NULLS) OVER win AS low,
         |       last_value(c IGNORE NULLS) OVER win AS close,
         |       coalesce(v, CAST(0 AS DOUBLE)) AS volume,
         |       coalesce(n, 0) AS n_bars
         |FROM j
         |WINDOW win AS (PARTITION BY symbol ORDER BY bucket_ts
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin),
    "a1_ohlcv_month" -> (dbarsSql +
      s"""
         |SELECT symbol, date_trunc('month', ts) AS bucket_ts,
         |       arg_min(open, ts) AS open, max(high) AS high, min(low) AS low,
         |       arg_max(close, ts) AS close,
         |       ${O.exactSum("volume")} AS volume, count(*) AS n_bars
         |FROM dbars GROUP BY 1, 2""".stripMargin),
    "a1_ohlcv_3d" -> (dbarsSql +
      s""", org AS (
         |  SELECT symbol, epoch_us(date_trunc('day', min(ts))) AS o_us
         |  FROM dbars GROUP BY symbol
         |)
         |SELECT d.symbol AS symbol,
         |       make_timestamp(o_us + ((epoch_us(ts) - o_us) // ${3L * 86400000000L}) * ${3L * 86400000000L}) AS bucket_ts,
         |       arg_min(open, ts) AS open, max(high) AS high, min(low) AS low,
         |       arg_max(close, ts) AS close,
         |       ${O.exactSum("volume")} AS volume, count(*) AS n_bars
         |FROM dbars d JOIN org ON d.symbol = org.symbol
         |GROUP BY 1, 2""".stripMargin),
    "a1_ohlcv_1w" -> (dbarsSql +
      s"""
         |SELECT symbol, date_trunc('week', ts) + INTERVAL 6 DAY AS bucket_ts,
         |       arg_min(open, ts) AS open, max(high) AS high, min(low) AS low,
         |       arg_max(close, ts) AS close,
         |       ${O.exactSum("volume")} AS volume, count(*) AS n_bars
         |FROM dbars GROUP BY 1, 2""".stripMargin),
    "a3_symbol_stats" -> (dbarsSql +
      s"""
         |SELECT count(*) AS n_bars,
         |       min(${O.epochUs("ts")}) AS min_ts_us,
         |       max(${O.epochUs("ts")}) AS max_ts_us,
         |       min(close) AS min_close, max(close) AS max_close,
         |       ${O.exactAvg("close")} AS avg_close,
         |       ${O.exactSum("volume")} AS sum_volume
         |FROM dbars WHERE symbol = 'click'""".stripMargin),
    "a4_latest_ts" -> (Tables.barsSql +
      s"""
         |SELECT symbol, max(${O.epochUs("ts")}) AS latest_ts_us
         |FROM bars GROUP BY symbol""".stripMargin),
    "a6_docs_by_source" ->
      "SELECT source, count(*) AS n_docs FROM documents GROUP BY source",
    "a7_latest_order_status" ->
      """SELECT CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
        |       count(*) AS n_customers
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn = 1""".stripMargin,
    "a8_null_census" -> (Tables.barsSql +
      """
        |SELECT count(*) AS n_rows,
        |       CAST(sum(CASE WHEN open IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_open,
        |       CAST(sum(CASE WHEN high IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_high,
        |       CAST(sum(CASE WHEN low IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_low,
        |       CAST(sum(CASE WHEN close IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_close,
        |       CAST(sum(CASE WHEN volume IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_volume
        |FROM bars""".stripMargin),
    "a9_date_range" ->
      s"""SELECT min(${O.epochUs("CAST(ts AS TIMESTAMP)")}) AS min_ts_us,
         |       max(${O.epochUs("CAST(ts AS TIMESTAMP)")}) AS max_ts_us,
         |       count(*) AS n_events
         |FROM events""".stripMargin,
    "a10_norm_stats" -> (dbarsSql +
      s"""
         |SELECT ${O.exactAvg("open")} AS mu_open,
         |       ${O.exactStdSamp("open")} AS sd_open,
         |       min(open) AS min_open, max(open) AS max_open,
         |       ${O.exactAvg("volume")} AS mu_volume,
         |       ${O.exactStdSamp("volume")} AS sd_volume,
         |       min(volume) AS min_volume, max(volume) AS max_volume
         |FROM dbars""".stripMargin),
    "a11_volume_profile" -> (dbarsSql +
      s""", nn AS (
         |  SELECT * FROM dbars WHERE volume IS NULL OR volume >= 0
         |), b AS (
         |  SELECT min(close) AS mn, max(close) AS mx FROM nn
         |), bk AS (
         |  SELECT CAST(least(floor((close - mn) / ((mx - mn) / CAST(100 AS DOUBLE))), CAST(99 AS DOUBLE)) AS BIGINT) AS bucket,
         |         mn, (mx - mn) / CAST(100 AS DOUBLE) AS w, volume
         |  FROM nn CROSS JOIN b
         |)
         |SELECT bucket, mn + (CAST(bucket AS DOUBLE) + ${"CAST('0.5' AS DOUBLE)"}) * w AS bin_center,
         |       ${O.exactSum("volume")} AS bucket_volume, count(*) AS n_bars
         |FROM bk GROUP BY bucket, mn, w""".stripMargin),
    "a12_meta_summary" ->
      """SELECT count(DISTINCT lang) AS n_langs,
        |       count(DISTINCT source) AS n_sources,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       count(*) AS n_docs
        |FROM documents""".stripMargin
  )
}
