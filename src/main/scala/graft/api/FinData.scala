package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.pipeline.Pipeline

/** Reference-parity facade: every user-facing entry point of
  * josetraderx/financial-data-pipeline, one method each, delegating to the
  * graft operator library. A reference user switches by replacing the
  * pandas DataFrame with a Spark one — method-for-method.
  *
  * Reference anchors (file:line refer to /root/reference):
  *   - EnhancedDataValidator.validate_and_clean  → [[validateAndClean]]
  *     (data_cleaner.py:56-173)
  *   - DataNormalizer.normalize_ohlcv / inverse  → [[normalizeOhlcv]] /
  *     [[inverseNormalize]] (data_normalizer.py:25-101)
  *   - TimeframeAggregator.aggregate_ohlcv / _multiple_timeframes
  *     → [[aggregateOhlcv]] / [[aggregateMultiple]]
  *     (timeframe_aggregator.py:46-115)
  *   - TechnicalIndicators.calculate_all → [[calculateAllIndicators]]
  *     (technical_indicators.py:83-122)
  *   - DataSplitter.train_test_split / split_three_way / split_by_date /
  *     create_sliding_windows → [[trainTestSplit]] / [[threeWaySplit]] /
  *     [[splitByDate]] / [[slidingWindows]] (data_splitter.py:32-263)
  *   - TimeSeriesDB.query_ohlcv_data → [[queryOhlcv]]
  *     (timeseries_db.py:252-311)
  *   - TimeSeriesDB.get_symbol_stats → [[symbolStats]]
  *     (timeseries_db.py:349-397)
  *   - TimeSeriesDB.get_latest_timestamp → [[latestTimestamp]]
  *     (timeseries_db.py:313-347)
  *   - DataValidator quality score → [[qualityScore]]
  *     (data_validator.py:135-186)
  *   - CryptoPipeline.run_pipeline_single → [[Pipeline.run]]
  *     (crypto_pipeline.py:340-489)
  */
object FinData {

  private val order = Seq(col("ts"), col("symbol"))

  /** The 12-step cleaning chain as one fused transform.
    *
    * Dedup tiebreak: (ts, symbol) are constant within a (symbol, ts)
    * partition, so the kept row needs a stable tiebreak when duplicate keys
    * carry different payloads — event_id when present (as Pipeline.run),
    * else every remaining column in name order.
    */
  def validateAndClean(bars: DataFrame): DataFrame = {
    val tiebreak =
      if (bars.columns.contains("event_id")) Seq(col("event_id"))
      else bars.columns.filterNot(Set("symbol", "ts")).sorted.map(col).toSeq
    val deduped = Cleaning.dedupKeepFirstSeries(bars, Seq("symbol"), col("ts"), tiebreak)
    val filled = Cleaning.bfill(
      Cleaning.ffill(deduped, Seq("close"), Seq("symbol"), order),
      Seq("close"), Seq("symbol"), order)
    Cleaning.addTimeFeatures(
      Cleaning.repairOhlc(Cleaning.filterNonNegative(filled)), "ts")
  }

  def normalizeOhlcv(bars: DataFrame, method: String = "zscore",
      cols: Seq[String] = Seq("open", "high", "low", "close", "volume")): DataFrame =
    method match {
      case "zscore" => Normalize.zscoreTransform(Normalize.zscoreFit(bars, cols), cols)
      case "minmax" => Normalize.minmaxTransform(Normalize.minmaxFit(bars, cols), cols)
      case "log" => Normalize.logTransform(bars, cols)
      case m => throw new IllegalArgumentException(s"unknown method: $m")
    }

  def inverseNormalize(fitted: DataFrame, method: String,
      cols: Seq[String]): DataFrame = method match {
    case "zscore" => Normalize.finish(Normalize.zscoreInverse(fitted, cols))
    case "minmax" => Normalize.finish(Normalize.minmaxInverse(fitted, cols))
    case "log" => Normalize.logInverse(fitted, cols)
    case m => throw new IllegalArgumentException(s"unknown method: $m")
  }

  /** timeframe is a reference string: 1m 3m 5m 15m 30m 1h 2h 4h 6h 8h 12h
    * 1d 3d 1w 1M (timeframe_aggregator.py:11-27). `fill` defaults true
    * because the reference's aggregate_ohlcv unconditionally ffills the
    * resampled frame (timeframe_aggregator.py:77).
    */
  def aggregateOhlcv(bars: DataFrame, timeframe: String, fill: Boolean = true): DataFrame = {
    require(Resample.fillStep.contains(timeframe),
      s"Invalid timeframe '$timeframe'. Valid: ${Resample.fillStep.keys.toSeq.sorted.mkString(", ")}")
    val agg = Resample.resample(bars, timeframe)
    if (fill) Resample.fillGaps(agg, Resample.fillStep(timeframe)) else agg
  }

  def aggregateMultiple(bars: DataFrame, timeframes: Seq[String]): Map[String, DataFrame] =
    Resample.multiFrame(bars, timeframes)

  /** Appends the reference's 13 indicator columns. */
  def calculateAllIndicators(bars: DataFrame): DataFrame =
    Indicators.withIndicators(bars, Seq(col("symbol")), Seq(col("ts")))

  def trainTestSplit(bars: DataFrame, testRatio: Double = 0.2): DataFrame =
    Split.chronological(bars, order, Seq(1 - testRatio), Seq("train", "test"))

  def threeWaySplit(bars: DataFrame, trainRatio: Double, valRatio: Double): DataFrame =
    Split.chronological(bars, order,
      Seq(trainRatio, trainRatio + valRatio), Seq("train", "val", "test"))

  def splitByDate(bars: DataFrame, cutoffs: Seq[String],
      labels: Seq[String]): DataFrame =
    Split.splitByDate(bars, col("ts"), cutoffs, labels)

  def slidingWindows(bars: DataFrame, window: Int, target: Int,
      stride: Int, valueCol: Column = col("close")): DataFrame =
    Split.slidingWindows(bars, Seq(col("symbol")), order, valueCol,
      window, target, stride)

  /** `SELECT … WHERE symbol=? [AND ts∈[a,b]] ORDER BY ts DESC [LIMIT n]`. */
  def queryOhlcv(bars: DataFrame, symbol: String,
      from: Option[String] = None, to: Option[String] = None,
      limit: Option[Int] = None): DataFrame =
    graft.sources.Jdbc.ohlcvRange(bars, symbol, from, to, limit)

  def symbolStats(bars: DataFrame, symbol: String): DataFrame =
    bars.filter(col("symbol") === symbol).agg(
      count(lit(1)).as("record_count"),
      min("ts").as("earliest"), max("ts").as("latest"),
      min("close").as("min_close"), max("close").as("max_close"),
      avg("close").as("avg_close"), sum("volume").as("total_volume"))

  def latestTimestamp(bars: DataFrame, symbol: String): DataFrame =
    bars.filter(col("symbol") === symbol).agg(max("ts").as("latest_timestamp"))

  /** Weighted quality score (0.3 completeness + 0.3 OHLC validity +
    * 0.2 temporal continuity + 0.2 volume>0), per symbol.
    */
  def qualityScore(bars: DataFrame): DataFrame =
    Cleaning.qualityScore(bars, Seq("symbol"), order)
}
