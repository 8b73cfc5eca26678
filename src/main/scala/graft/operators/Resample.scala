package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** OHLCV time-bucket resampling (SURVEY.md §2.4 A1/A2) — the Spark
  * re-expression of the reference's `timeframe_aggregator.py:46-115` and the
  * TimescaleDB continuous aggregate (`timescaledb_schema.sql:49-66`).
  *
  * Semantics per (symbol, bucket): open = value at earliest ts, high = max,
  * low = min, close = value at latest ts, volume = sum. `min_by`/`max_by` on
  * ts — NEVER `first`/`last`, whose groupBy order is undefined in Spark
  * (SURVEY §7.2). Input must be deduplicated on (symbol, ts) so the argmin
  * is unique (the reference pipeline dedups before resampling,
  * crypto_pipeline.py:160-216).
  *
  * Scale: `window()` tumbling buckets compile to pure projection arithmetic
  * (Catalyst TimeWindowing) — the only shuffle is the partial→final
  * hash aggregation on (symbol, bucket), which AQE coalesces. No sort, no
  * window-function pass. At 100 TB this is the textbook map-side-combine
  * aggregation; a year of 1-minute bars per symbol is ~526k buckets — tiny.
  * Calendar gap-fill generates each symbol's bucket range with `sequence()`
  * (linear in range length, per-symbol parallel) and forward-fills with one
  * ordered window per symbol.
  */
object Resample {

  /** Reference timeframe strings → Spark interval strings
    * (timeframe_aggregator.py:11-27). "1M" (calendar month) is handled by
    * [[ohlcvMonthly]] since tumbling windows have no month interval; "3d"
    * by [[ohlcvAnchored]] (pandas '3D' anchors to the series' start day,
    * not the epoch); "1w" by [[ohlcvWeekly]] (pandas 'W-SUN' bins ISO
    * weeks). [[resample]] dispatches; `frames` maps the epoch-aligned rest.
    */
  val frames: Map[String, String] = Map(
    "1m" -> "1 minute", "3m" -> "3 minutes", "5m" -> "5 minutes",
    "15m" -> "15 minutes", "30m" -> "30 minutes", "1h" -> "1 hour",
    "2h" -> "2 hours", "4h" -> "4 hours", "6h" -> "6 hours",
    "8h" -> "8 hours", "12h" -> "12 hours", "1d" -> "1 day",
    "3d" -> "3 days", "1w" -> "7 days")

  /** Interval to step fillGaps by, for every reference frame. */
  val fillStep: Map[String, String] = frames + ("1M" -> "1 month")

  /** All 15 reference frames, dispatched to the right bucketing rule:
    * epoch-aligned tumbling for intraday/daily frames (== pandas
    * origin='start_day' there, since those intervals divide a day),
    * series-anchored for "3d", ISO-week for "1w", calendar month for "1M".
    */
  def resample(df: DataFrame, timeframe: String, ts: Column = col("ts")): DataFrame =
    timeframe match {
      case "1M" => ohlcvMonthly(df, ts)
      case "3d" => ohlcvAnchored(df, frames("3d"), ts)
      case "1w" => ohlcvWeekly(df, ts)
      case f => ohlcv(df, frames(f), ts)
    }

  private def ohlcvAggs(ts: Column): Seq[Column] = Seq(
    min_by(col("open"), ts).as("open"),
    max(col("high")).as("high"),
    min(col("low")).as("low"),
    max_by(col("close"), ts).as("close"),
    exactSum(col("volume")).as("volume"),
    count(lit(1)).as("n_bars"))

  /** A1 — roll 1-minute bars up to `interval` tumbling buckets (epoch-aligned,
    * left-closed/left-labeled — matches pandas `resample` for these
    * frequencies and TimescaleDB `time_bucket`).
    */
  def ohlcv(df: DataFrame, interval: String, ts: Column = col("ts")): DataFrame = {
    val aggs = ohlcvAggs(ts)
    df.groupBy(col("symbol"), window(ts, interval))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("symbol") +: col("window.start").as("bucket_ts") +:
        Seq("open", "high", "low", "close", "volume", "n_bars").map(col): _*)
  }

  /** A1 variant for CONTINUOUS-AGGREGATE MATERIALIZATION
    * ([[graft.plans.RollupCatalog.register]]): the bars shape of [[ohlcv]]
    * plus, per requested raw column, the exact-composition columns
    * `sum_<c>` (decimal bucket sum), `sum2_<c>` (decimal bucket sum of
    * squares) and `n_<c>` (non-null count) that let
    * [[graft.plans.RollupRewrite]] serve `exactSum`/`exactAvg`/
    * `exactVarSamp`/`count(c)`-shaped queries BIT-EXACTLY from the roll-up
    * (decimal addition is associative; the double rounding happens once,
    * at the query's top-level cast). The double `volume` column remains for
    * direct bars-shaped readers; Sum queries are never served from it.
    */
  def ohlcvRollup(df: DataFrame, interval: String,
      exactCols: Seq[String] = Seq("volume"), ts: Column = col("ts")): DataFrame = {
    val aggs = ohlcvAggs(ts) ++ exactCols.flatMap(c => Seq(
      exactSumDec(col(c)).as(s"sum_$c"),
      exactSumSqDec(col(c)).as(s"sum2_$c"),
      count(col(c)).as(s"n_$c")))
    df.groupBy(col("symbol"), window(ts, interval))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("symbol") +: col("window.start").as("bucket_ts") +:
        (Seq("open", "high", "low", "close", "volume", "n_bars") ++
          exactCols.flatMap(c => Seq(s"sum_$c", s"sum2_$c", s"n_$c"))).map(col): _*)
  }

  /** A1, "1M" frame — calendar-month buckets via `date_trunc` (tumbling
    * windows have no month interval; SURVEY §7.3 item 1).
    */
  def ohlcvMonthly(df: DataFrame, ts: Column = col("ts")): DataFrame = {
    val aggs = ohlcvAggs(ts)
    df.groupBy(col("symbol"), date_trunc("month", ts).as("bucket_ts"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** A1, "3d"-style frames — buckets anchored to each symbol's first day
    * (pandas `resample('3D')` default `origin='start_day'`): bucket k of a
    * symbol spans [origin + k·iv, origin + (k+1)·iv) where origin is
    * midnight of the symbol's earliest timestamp. The per-symbol origin is
    * a partition-window min (one shuffle shared with the aggregation);
    * bucketing itself is pure arithmetic — no epoch-aligned `window()`,
    * whose 3-day buckets would land on a different (epoch-dependent) phase.
    */
  def ohlcvAnchored(df: DataFrame, interval: String, ts: Column = col("ts")): DataFrame = {
    val ivMicros = interval match {
      case s"$n day$_" => n.trim.toLong * 86400000000L
      case s"$n hour$_" => n.trim.toLong * 3600000000L
      case other => throw new IllegalArgumentException(s"unsupported anchor interval: $other")
    }
    // .cast("timestamp"): unix_micros rejects TIMESTAMP_NTZ; the session
    // is UTC so the cast matches DuckDB's naive epoch_us
    val origin = unix_micros(date_trunc("day",
      min(ts).over(Window.partitionBy(col("symbol")))).cast("timestamp"))
    // emit NTZ like every other bucket column (UTC session; the driver's
    // canonicalizer should never see a tz-aware dtype from one query only)
    val bucket = timestamp_micros(
      origin + floor((unix_micros(ts.cast("timestamp")) - origin) / ivMicros).cast("long") * ivMicros)
      .cast("timestamp_ntz")
    val aggs = ohlcvAggs(ts)
    df.withColumn("__bucket", bucket)
      .groupBy(col("symbol"), col("__bucket").as("bucket_ts"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** A1, "1w" frame — pandas `resample('1W')` is 'W-SUN': values bin by ISO
    * week (Monday 00:00 edges) and the bucket is labeled with its Sunday.
    * `date_trunc("week", ts)` is the ISO Monday; label = Monday + 6 days.
    */
  def ohlcvWeekly(df: DataFrame, ts: Column = col("ts")): DataFrame = {
    val aggs = ohlcvAggs(ts)
    df.groupBy(col("symbol"),
        (date_trunc("week", ts) + expr("INTERVAL 6 DAYS")).as("bucket_ts"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** A1 gap-fill — materialize empty buckets on each symbol's
    * [min, max] bucket calendar and forward-fill OHLC; empty buckets get
    * volume = 0 and n_bars = 0 (pandas: sum over empty bucket is 0, ohlc is
    * NaN then `ffill`, timeframe_aggregator.py:77).
    *
    * `interval` must be the same tumbling interval used to build `agg`,
    * in Spark INTERVAL syntax (e.g. "1 hour").
    */
  def fillGaps(agg: DataFrame, interval: String): DataFrame = {
    val cal = agg.groupBy("symbol")
      .agg(min("bucket_ts").as("__lo"), max("bucket_ts").as("__hi"))
      .select(col("symbol"),
        explode(expr(s"sequence(__lo, __hi, INTERVAL $interval)")).as("bucket_ts"))
    val w = Window.partitionBy("symbol").orderBy("bucket_ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = cal.join(agg, Seq("symbol", "bucket_ts"), "left")
    Seq("open", "high", "low", "close")
      .foldLeft(joined)((d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
      .withColumn("volume", coalesce(col("volume"), lit(0.0)))
      .withColumn("n_bars", coalesce(col("n_bars"), lit(0L)))
  }

  /** A1 multi-frame fan-out (timeframe_aggregator.py:97-115): one resampled
    * DataFrame per requested frame, all lazily sharing the cleaned input.
    */
  def multiFrame(df: DataFrame, requested: Seq[String]): Map[String, DataFrame] =
    requested.map(f => f -> resample(df, f)).toMap
}
