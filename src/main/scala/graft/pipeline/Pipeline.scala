package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Cleaning, Indicators, Normalize, Resample, Split}
import graft.sinks.Lake

/** End-to-end pipeline driver — the Spark shape of the reference's
  * `CryptoPipeline.run_pipeline_single` (crypto_pipeline.py:340-489):
  * extract → validate/clean (+ one-pass report) → [normalize] → [resample]
  * → [indicators] → split → write.
  *
  * Where the reference materializes 12 intermediate frames and walks rows
  * in Python, this declares ONE lazy DataFrame DAG; Catalyst fuses the
  * cleaning chain into a single scan+project stage and the report counters
  * ride along as `observe()` metrics — the full §2.3 validation report
  * costs zero extra passes.
  *
  * Deliberate semantic changes from the reference (SURVEY §7.3.6-7):
  * normalization happens AFTER resampling (the reference normalizes first,
  * so aggregated volume sums z-scores — a documented bug, not a feature),
  * and the dead `store_metadata` / unconditional-upsert paths are gone.
  */
object Pipeline {

  case class Config(
      cleaning: CleaningConfig = CleaningConfig(),
      resampleTo: Option[String] = None, // e.g. "1 hour"
      normalize: Option[String] = None, // zscore | minmax | log
      normalizeCols: Seq[String] = Seq("open", "high", "low", "close", "volume"),
      indicators: Boolean = false,
      split: SplitConfig = SplitConfig(),
      outputPath: Option[String] = None)

  case class CleaningConfig(
      dedup: Boolean = true,
      fillCols: Seq[String] = Seq("close"),
      dropNegative: Boolean = true,
      repairOhlc: Boolean = true,
      timeFeatures: Boolean = true)

  case class SplitConfig(cuts: Seq[Double] = Seq(0.8),
      labels: Seq[String] = Seq("train", "test"))

  case class Result(data: DataFrame, report: Map[String, Any], splitSizes: Map[String, Long])

  /** Input contract: symbol, ts, open, high, low, close, volume (+ id col
    * used for deterministic dedup ordering when present).
    */
  def run(spark: SparkSession, bars: DataFrame, config: Config): Result = {
    val order =
      if (bars.columns.contains("event_id")) Seq(col("ts"), col("event_id"))
      else Seq(col("ts"))

    // ---- validate + clean, report riding along as observed metrics
    val obs = Observation("validation")
    val observed = bars.observe(obs,
      count(lit(1)).as("rows_in"),
      sum(when(col("close").isNull, 1L).otherwise(0L)).as("null_close"),
      sum(when(Cleaning.ohlcInvalid(), 1L).otherwise(0L)).as("ohlc_violations"),
      sum(when(col("volume") < 0, 1L).otherwise(0L)).as("negative_volume"))

    var df = observed
    val c = config.cleaning
    if (c.dedup) df = Cleaning.dedupKeepFirstSeries(df, Seq("symbol"),
      col("ts"), order.drop(1)) // order.head IS ts; tiebreak is the rest
    if (c.fillCols.nonEmpty) {
      df = Cleaning.ffill(df, c.fillCols, Seq("symbol"), order)
      df = Cleaning.bfill(df, c.fillCols, Seq("symbol"), order)
    }
    if (c.dropNegative) df = Cleaning.filterNonNegative(df)
    if (c.repairOhlc) df = Cleaning.repairOhlc(df)
    if (c.timeFeatures) df = Cleaning.addTimeFeatures(df, "ts")

    // ---- resample, indicators, normalize (post-aggregation, see Scaladoc)
    config.resampleTo.foreach { freq =>
      df = Resample.ohlcv(df, freq)
        .withColumnRenamed("bucket_ts", "ts")
    }
    if (config.indicators)
      df = Indicators.withIndicators(df, Seq(col("symbol")), Seq(col("ts")))
    config.normalize.foreach {
      case "zscore" =>
        df = Normalize.finish(Normalize.zscoreTransform(
          Normalize.zscoreFit(df, config.normalizeCols), config.normalizeCols))
      case "minmax" =>
        df = Normalize.finish(Normalize.minmaxTransform(
          Normalize.minmaxFit(df, config.normalizeCols), config.normalizeCols))
      case "log" =>
        df = Normalize.logTransform(df, config.normalizeCols)
      case other => throw new IllegalArgumentException(s"unknown normalize: $other")
    }

    // ---- chronological split label
    df = Split.chronological(df, Seq(col("ts")) ++
      (if (df.columns.contains("event_id")) Seq(col("event_id")) else Nil),
      config.split.cuts, config.split.labels)

    // ---- write (partitioned lake) or materialize
    config.outputPath match {
      case Some(path) => Lake.writeArchive(df, path)
      case None => ()
    }
    val sizes = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // sizes' action populated the observation
    val report = obs.get
    Result(df, report, sizes)
  }

  /** Persist a run's validation report + per-metric quality rows through
    * the metadata store (reference crypto_pipeline.py:293-305
    * `store_validation_report` → metadata_db.py:258-320): bootstrap the
    * tables, upsert the dataset registry row, then the report keyed
    * (dataset_id, validation_timestamp) and one data_quality_metrics row
    * per numeric report entry. Idempotent end to end — a replayed run
    * overwrites itself instead of appending duplicates.
    */
  def persistReport(spark: SparkSession, result: Result, datasetName: String,
      provider: String, symbol: String, timeframe: String,
      at: java.sql.Timestamp,
      connect: () => java.sql.Connection): Long = {
    import graft.sinks.MetaStore
    MetaStore.bootstrap(connect)
    val dsId = MetaStore.datasetId(datasetName, provider, symbol, timeframe)
    val reportAll = result.report ++
      result.splitSizes.map { case (k, v) => s"split_$k" -> v }
    MetaStore.storeDatasetMetadata(
      MetaStore.datasetMetadataDf(spark, datasetName, provider, symbol,
        timeframe, result.splitSizes.values.sum, at, at), connect)
    MetaStore.storeValidationReport(spark, dsId, reportAll, at, connect)
    MetaStore.storeQualityMetrics(spark, dsId, reportAll, at, connect)
    dsId
  }
}
