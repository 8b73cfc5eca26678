package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Declared-query catalog for the §2.5 indicator operators: (DataFrame
  * program, DuckDB oracle SQL) pairs over the shared `bars` fixture with
  * close forward/backward-filled (indicators run post-clean, as in the
  * reference pipeline crypto_pipeline.py:160-216).
  *
  * Oracle notes:
  *  - rolling means/stds mirror the DECIMAL(38,10)-sum trees of
  *    [[Indicators]] so doubles are bit-identical;
  *  - the EMA recurrence is mirrored with a prefix `list(...)` +
  *    `list_reduce` fold — same IEEE operation order as the Catalyst
  *    [[graft.functions.Ema]];
  *  - float literals are emitted as `CAST('<repr>' AS DOUBLE)` so DuckDB
  *    does double (not decimal) arithmetic, matching Spark exactly.
  */
object IndicatorQueries {

  private val order = Seq(col("ts"), col("event_id"))

  /** bars with close ffill+bfill per symbol — the indicator input series.
    *
    * The bfill AFTER an ffill only ever fills a symbol's LEADING nulls
    * (interior/trailing ones are already forward-filled), and their fill
    * value is the symbol's FIRST non-null close in series order — a
    * scalar per symbol. Computing it as a whole-partition window aggregate
    * ON THE FFILL OUTPUT replaces both [[Cleaning.bfill]]'s full DESC
    * re-sort + window pass AND round 16's separate aggregate + broadcast
    * join (which re-scanned bars and regressed the cheap w-queries): a
    * window with partitionBy(symbol) and NO order/frame is an
    * UnboundedWindowFunctionFrame — evaluated ONCE per partition, O(n),
    * on the partitioning ffill already established, so the whole w-family
    * chain is ONE scan, ONE exchange, ONE sort:
    * Sort ASC → Window(ffill) → Window(first-close) → Window(indicators).
    * min(struct(order..., close)) picks close by the same (ts, event_id)
    * total order as the series (ties impossible — event_id is unique),
    * and computing it over the FILLED close is sound: ffill only
    * propagates values FORWARD, so the earliest non-null filled close is
    * the earliest non-null raw close, with the same value.
    */
  private def cbars(s: SparkSession, dir: String): DataFrame = {
    val b = Tables.bars(s, dir)
    val filled = Cleaning.ffill(b, Seq("close"), Seq("symbol"), order)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("symbol"))
    val firstClose = min(when(col("close").isNotNull,
        struct(col("ts"), col("event_id"), col("close"))))
      .over(wAll).getField("close")
    filled.withColumn("close", coalesce(col("close"), firstClose))
  }

  private val S = Indicators.Series(Seq(col("symbol")), order)

  // ---------------------------------------------------------------- SQL side

  private val W = "PARTITION BY symbol ORDER BY ts, event_id"

  private def frame(n: Int) =
    s"ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW"

  private def dbl(x: Double): String = s"CAST('${x.toString}' AS DOUBLE)"

  /** Exact decimal windowed sum of `x` over the trailing n-row frame. */
  private def decSum(x: String, n: Int) =
    s"CAST(sum(CAST($x AS DECIMAL(38,10))) OVER ($W ${frame(n)}) AS DOUBLE)"

  /** Gated rolling mean mirroring [[Indicators.sma]]. */
  private def smaSql(x: String, n: Int) =
    s"CASE WHEN count($x) OVER ($W ${frame(n)}) = $n THEN ${decSum(x, n)} / CAST($n AS DOUBLE) END"

  /** Gated rolling sample std mirroring [[Indicators.rollingStdSamp]]. */
  private def stdSql(x: String, n: Int) = {
    val s = decSum(x, n)
    val sq = s"CAST(sum(CAST($x*$x AS DECIMAL(38,10))) OVER ($W ${frame(n)}) AS DOUBLE)"
    val nd = s"CAST($n AS DOUBLE)"
    s"CASE WHEN count($x) OVER ($W ${frame(n)}) = $n THEN sqrt(($sq - $s * $s / $nd) / ($nd - ${dbl(1.0)})) END"
  }

  /** Prefix list of non-null `x` in window order — EMA fold input. */
  private def prefixList(x: String) =
    s"list($x) FILTER ($x IS NOT NULL) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"

  /** EMA fold over a prefix list, mirroring [[graft.functions.Ema]]:
    * seed = first element, step = α·v + (1−α)·acc, all in double.
    */
  private def emaSql(listCol: String, span: Int): String = {
    val a = dbl(2.0 / (span + 1.0))
    s"CASE WHEN len($listCol) = 0 THEN NULL ELSE list_reduce($listCol, (acc, v) -> $a*v + (${dbl(1.0)} - $a)*acc) END"
  }

  /** cbars CTE: bars + filled close (mirror of the Spark `cbars`). */
  private val cbarsSql: String = Tables.barsSql +
    s""", cbars AS (
       |  SELECT event_id, symbol, ts, open, high, low,
       |         coalesce(
       |           last_value(close IGNORE NULLS) OVER ($W
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |           first_value(close IGNORE NULLS) OVER ($W
       |             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS close,
       |         volume
       |  FROM bars
       |)""".stripMargin

  private val gainSql =
    s"CASE WHEN __delta IS NULL THEN NULL WHEN __delta > 0 THEN __delta ELSE CAST(0 AS DOUBLE) END"
  private val lossSql =
    s"CASE WHEN __delta IS NULL THEN NULL WHEN __delta < 0 THEN -__delta ELSE CAST(0 AS DOUBLE) END"

  private def rsiSql(n: Int): String = {
    val g = smaSql("__gain", n)
    val l = smaSql("__loss", n)
    // layered: callers provide __gain/__loss; here we emit avg columns
    s"$g AS __avg_gain, $l AS __avg_loss"
  }

  private val rsiFinalSql =
    s"""CASE WHEN __avg_gain IS NULL OR __avg_loss IS NULL THEN NULL
       |     WHEN __avg_loss = 0 AND __avg_gain > 0 THEN ${dbl(100.0)}
       |     WHEN __avg_loss = 0 AND __avg_gain = 0 THEN NULL
       |     ELSE ${dbl(100.0)} - ${dbl(100.0)} / (${dbl(1.0)} + __avg_gain / __avg_loss)
       |END""".stripMargin

  private val trSql =
    """CASE WHEN __pc IS NULL THEN high - low
      |     ELSE greatest(high - low, abs(high - __pc), abs(low - __pc)) END""".stripMargin

  /** Wilder RMA fold (alpha = 1/n), same shape as [[emaSql]]. */
  private def rmaSql(listCol: String, n: Int): String = {
    val a = dbl(1.0 / n)
    s"CASE WHEN len($listCol) = 0 THEN NULL ELSE list_reduce($listCol, (acc, v) -> $a*v + (${dbl(1.0)} - $a)*acc) END"
  }

  private val rsiWilderFinalSql =
    s"""CASE WHEN __ag IS NULL OR __al IS NULL THEN NULL
       |     WHEN __al = 0 AND __ag > 0 THEN ${dbl(100.0)}
       |     WHEN __al = 0 AND __ag = 0 THEN NULL
       |     ELSE ${dbl(100.0)} - ${dbl(100.0)} / (${dbl(1.0)} + __ag / __al)
       |END""".stripMargin

  // ------------------------------------------------------------- the catalog

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w1_sma" -> ((s, dir) =>
      cbars(s, dir).select(col("event_id"), col("symbol"),
        Indicators.sma(col("close"), 20, S).as("sma_20"),
        Indicators.sma(col("close"), 50, S).as("sma_50"))),
    "w2_ema" -> ((s, dir) =>
      cbars(s, dir).select(col("event_id"), col("symbol"),
        Indicators.ema(col("close"), 12, S).as("ema_12"),
        Indicators.ema(col("close"), 26, S).as("ema_26"))),
    "w3_rsi" -> ((s, dir) =>
      // staged form: averages aliased once, CASE over attribute refs
      Indicators.withRsi(cbars(s, dir), col("close"), 14, S, "rsi_14")
        .select(col("event_id"), col("symbol"), col("rsi_14"))),
    "w4_macd" -> ((s, dir) => {
      val base = cbars(s, dir)
        .withColumn("macd",
          Indicators.ema(col("close"), 12, S) - Indicators.ema(col("close"), 26, S))
      base.select(col("event_id"), col("symbol"), col("macd"),
        Indicators.ema(col("macd"), 9, S).as("macd_signal"))
        .withColumn("macd_hist", col("macd") - col("macd_signal"))
    }),
    "w5_bollinger" -> ((s, dir) =>
      // staged form: mid/std aliased once, bands derived arithmetically
      Indicators.withBollinger(cbars(s, dir), col("close"), 20, S)
        .select(col("event_id"), col("symbol"),
          col("bb_middle"), col("bb_upper"), col("bb_lower"))),
    "w6_atr" -> ((s, dir) =>
      cbars(s, dir).select(col("event_id"), col("symbol"),
        Indicators.atr(col("high"), col("low"), col("close"), 14, S).as("atr_14"))),
    "w7_pct_change" -> ((s, dir) =>
      cbars(s, dir).select(col("event_id"), col("symbol"),
        Indicators.pctChange(col("close"), S).as("pct_change"))),
    "w8_diff" -> ((s, dir) =>
      cbars(s, dir).select(col("event_id"), col("symbol"),
        Indicators.diff(col("close"), S).as("close_diff"))),
    "w10_rsi_wilder" -> ((s, dir) => {
      // staged like w3: the two RMA window functions aliased once
      val (ag, al) = Indicators.rsiWilderAverages(col("close"), 14, S)
      cbars(s, dir)
        .select(col("event_id"), col("symbol"), ag.as("__ag"), al.as("__al"))
        .select(col("event_id"), col("symbol"),
          Indicators.rsiFromAverages(col("__ag"), col("__al")).as("rsi_w"))
    }),
    "w11_atr_wilder" -> ((s, dir) =>
      cbars(s, dir).select(col("event_id"), col("symbol"),
        Indicators.atrWilder(col("high"), col("low"), col("close"), 14, S)
          .as("atr_w"))),
    "w12_chunked_finite" -> ((s, dir) =>
      // the hot-symbol skew path: (symbol, week)-chunked windows with a
      // 201-row replayed halo — bit-identical to the plain per-symbol
      // window, so the oracle is the PLAIN window SQL (the equivalence IS
      // the assertion). Project the dead columns (open, volume) away
      // BEFORE the chunked pipeline: chunkedSeries materializes its
      // marked frame, and Catalyst cannot prune columns through that
      // checkpoint.
      Skew.chunkedFiniteIndicators(
        cbars(s, dir).select(col("event_id"), col("symbol"), col("ts"),
          col("high"), col("low"), col("close")),
        Seq(col("symbol")), order,
          floor(unix_micros(col("ts").cast("timestamp")) / lit(7L * 86400 * 1000000L)))
        .select(col("event_id"), col("symbol"),
          col("sma_20"), col("sma_50"), col("sma_200"),
          col("bb_middle"), col("bb_upper"), col("bb_lower"),
          col("rsi_14"), col("atr_14"))),
    "w9_indicators_all" -> ((s, dir) =>
      Indicators.withIndicators(cbars(s, dir), Seq(col("symbol")), order)
        .select(col("event_id"), col("symbol"), col("close"),
          col("sma_20"), col("sma_50"), col("sma_200"),
          col("ema_12"), col("ema_26"), col("rsi_14"),
          col("macd"), col("macd_signal"), col("macd_hist"),
          col("bb_middle"), col("bb_upper"), col("bb_lower"), col("atr_14")))
  )

  val oracle: Map[String, String] = Map(
    "w1_sma" -> (cbarsSql +
      s"""
         |SELECT event_id, symbol,
         |       ${smaSql("close", 20)} AS sma_20,
         |       ${smaSql("close", 50)} AS sma_50
         |FROM cbars""".stripMargin),
    "w2_ema" -> (cbarsSql +
      s""", d1 AS (SELECT *, ${prefixList("close")} AS __lc FROM cbars)
         |SELECT event_id, symbol,
         |       ${emaSql("__lc", 12)} AS ema_12,
         |       ${emaSql("__lc", 26)} AS ema_26
         |FROM d1""".stripMargin),
    "w3_rsi" -> (cbarsSql +
      s""", d1 AS (SELECT *, close - lag(close, 1) OVER ($W) AS __delta FROM cbars),
         |d2 AS (SELECT *, $gainSql AS __gain, $lossSql AS __loss FROM d1),
         |d3 AS (SELECT *, ${rsiSql(14)} FROM d2)
         |SELECT event_id, symbol, $rsiFinalSql AS rsi_14
         |FROM d3""".stripMargin),
    "w4_macd" -> (cbarsSql +
      s""", d1 AS (SELECT *, ${prefixList("close")} AS __lc FROM cbars),
         |d2 AS (SELECT *, ${emaSql("__lc", 12)} - ${emaSql("__lc", 26)} AS macd FROM d1),
         |d3 AS (SELECT *, ${prefixList("macd")} AS __lm FROM d2),
         |d4 AS (SELECT *, ${emaSql("__lm", 9)} AS macd_signal FROM d3)
         |SELECT event_id, symbol, macd, macd_signal, macd - macd_signal AS macd_hist
         |FROM d4""".stripMargin),
    "w5_bollinger" -> (cbarsSql +
      s"""
         |SELECT event_id, symbol,
         |       ${smaSql("close", 20)} AS bb_middle,
         |       ${smaSql("close", 20)} + ${dbl(2.0)} * ${stdSql("close", 20)} AS bb_upper,
         |       ${smaSql("close", 20)} - ${dbl(2.0)} * ${stdSql("close", 20)} AS bb_lower
         |FROM cbars""".stripMargin),
    "w6_atr" -> (cbarsSql +
      s""", d1 AS (SELECT *, lag(close, 1) OVER ($W) AS __pc FROM cbars),
         |d2 AS (SELECT *, $trSql AS __tr FROM d1)
         |SELECT event_id, symbol, ${smaSql("__tr", 14)} AS atr_14
         |FROM d2""".stripMargin),
    "w10_rsi_wilder" -> (cbarsSql +
      s""", d1 AS (SELECT *, close - lag(close, 1) OVER ($W) AS __delta FROM cbars),
         |d2 AS (SELECT *, $gainSql AS __gain, $lossSql AS __loss FROM d1),
         |d3 AS (SELECT *, ${prefixList("__gain")} AS __lg, ${prefixList("__loss")} AS __ll FROM d2),
         |d4 AS (SELECT *, ${rmaSql("__lg", 14)} AS __ag, ${rmaSql("__ll", 14)} AS __al FROM d3)
         |SELECT event_id, symbol, $rsiWilderFinalSql AS rsi_w
         |FROM d4""".stripMargin),
    "w11_atr_wilder" -> (cbarsSql +
      s""", d1 AS (SELECT *, lag(close, 1) OVER ($W) AS __pc FROM cbars),
         |d2 AS (SELECT *, $trSql AS __tr FROM d1),
         |d3 AS (SELECT *, ${prefixList("__tr")} AS __lt FROM d2)
         |SELECT event_id, symbol, ${rmaSql("__lt", 14)} AS atr_w
         |FROM d3""".stripMargin),
    "w7_pct_change" -> (cbarsSql +
      s"""
         |SELECT event_id, symbol,
         |       close / lag(close, 1) OVER ($W) - ${dbl(1.0)} AS pct_change
         |FROM cbars""".stripMargin),
    "w8_diff" -> (cbarsSql +
      s"""
         |SELECT event_id, symbol,
         |       close - lag(close, 1) OVER ($W) AS close_diff
         |FROM cbars""".stripMargin),
    "w12_chunked_finite" -> (cbarsSql +
      s""", d1 AS (
         |  SELECT *, close - lag(close, 1) OVER ($W) AS __delta,
         |         lag(close, 1) OVER ($W) AS __pc,
         |         ${smaSql("close", 20)} AS sma_20,
         |         ${smaSql("close", 50)} AS sma_50,
         |         ${smaSql("close", 200)} AS sma_200,
         |         ${stdSql("close", 20)} AS __bb_std
         |  FROM cbars
         |), d2 AS (
         |  SELECT *, $gainSql AS __gain, $lossSql AS __loss, $trSql AS __tr
         |  FROM d1
         |), d3 AS (
         |  SELECT *, ${rsiSql(14)}, ${smaSql("__tr", 14)} AS atr_14
         |  FROM d2
         |)
         |SELECT event_id, symbol, sma_20, sma_50, sma_200,
         |       sma_20 AS bb_middle,
         |       sma_20 + ${dbl(2.0)} * __bb_std AS bb_upper,
         |       sma_20 - ${dbl(2.0)} * __bb_std AS bb_lower,
         |       $rsiFinalSql AS rsi_14, atr_14
         |FROM d3""".stripMargin),
    "w9_indicators_all" -> (cbarsSql +
      s""", d1 AS (
         |  SELECT *,
         |         ${prefixList("close")} AS __lc,
         |         close - lag(close, 1) OVER ($W) AS __delta,
         |         lag(close, 1) OVER ($W) AS __pc,
         |         ${smaSql("close", 20)} AS sma_20,
         |         ${smaSql("close", 50)} AS sma_50,
         |         ${smaSql("close", 200)} AS sma_200,
         |         ${smaSql("close", 20)} AS bb_middle,
         |         ${stdSql("close", 20)} AS __bb_std
         |  FROM cbars
         |), d2 AS (
         |  SELECT *, ${emaSql("__lc", 12)} AS ema_12, ${emaSql("__lc", 26)} AS ema_26,
         |         $gainSql AS __gain, $lossSql AS __loss, $trSql AS __tr
         |  FROM d1
         |), d3 AS (
         |  SELECT *, ema_12 - ema_26 AS macd, ${rsiSql(14)},
         |         ${smaSql("__tr", 14)} AS atr_14
         |  FROM d2
         |), d4 AS (
         |  SELECT *, ${prefixList("macd")} AS __lm, $rsiFinalSql AS rsi_14
         |  FROM d3
         |), d5 AS (
         |  SELECT *, ${emaSql("__lm", 9)} AS macd_signal
         |  FROM d4
         |)
         |SELECT event_id, symbol, close, sma_20, sma_50, sma_200, ema_12, ema_26,
         |       rsi_14, macd, macd_signal, macd - macd_signal AS macd_hist,
         |       bb_middle, bb_middle + ${dbl(2.0)} * __bb_std AS bb_upper,
         |       bb_middle - ${dbl(2.0)} * __bb_std AS bb_lower, atr_14
         |FROM d5""".stripMargin)
  )
}
