package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stress the heavy operators at ~10× the bench scale using the
  * deterministic generator (testdata tops out at sf0.1 ≈ 1 M bars; this
  * runs 10 M) to back the 100 TB scale claims with local evidence —
  * per-operator wall-clock and rows/s, no OOM, no single-partition
  * bottleneck. Results recorded in BASELINE.md.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L) // per symbol
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators._
    import graft.sources.Generator

    val symbols = Seq("btc", "eth", "sol", "ada", "dot")
    val bars = Generator.ohlcv(spark, symbols, n, intervalSec = 60).cache()
    val total = bars.count() // materialize once so op timings exclude generation

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $label%-22s rows=$rows%-10d ${sec}%6.1f s  ${total / sec / 1e6}%5.1f M rows/s")
    }

    println(s"[scale] corpus: $total bars (${symbols.size} symbols x $n)")
    val order = Seq(col("ts"), col("symbol"))
    time("clean-chain") {
      Cleaning.addTimeFeatures(Cleaning.repairOhlc(Cleaning.filterNonNegative(
        Cleaning.bfill(Cleaning.ffill(
          Cleaning.dedupKeepFirst(bars, Seq("symbol", "ts"), order),
          Seq("close"), Seq("symbol"), order), Seq("close"), Seq("symbol"), order)))).count()
    }
    time("resample-1h") { Resample.ohlcv(bars, "1 hour").count() }
    // checksum aggregates force the window columns (count() would let
    // Catalyst prune them away and time nothing)
    time("indicators-13col") {
      Indicators.withIndicators(bars, Seq(col("symbol")), Seq(col("ts")))
        .agg(sum(col("sma_20") + col("macd_hist") + col("atr_14") + col("rsi_14")))
        .count()
      total
    }
    time("ema-native-window") {
      bars.select(graft.functions.Ema.ema(col("close"), 12,
        Seq(col("symbol")), Seq(col("ts"))).as("e"))
        .agg(sum("e")).count()
      total
    }
    time("zscore-normalize") {
      Normalize.finish(Normalize.zscoreTransform(
        Normalize.zscoreFit(bars, Seq("close", "volume")),
        Seq("close", "volume")))
        .agg(sum(col("close") + col("volume"))).count()
      total
    }
    time("chrono-split") {
      Split.chronological(bars, order, Seq(0.8), Seq("train", "test"))
        .groupBy("split").count().count()
    }
    time("chrono-split-atscale") {
      Split.chronologicalAtScale(bars, col("ts"), Seq(0.8), Seq("train", "test"))
        .groupBy("split").count().count()
    }
    time("date-split") {
      Split.splitByDate(bars, col("ts"),
        Seq("2026-01-01 00:00:00"), Seq("train", "test"))
        .groupBy("split").count().count()
    }
    spark.stop()
  }
}
