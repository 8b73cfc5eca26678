package graft

import org.apache.spark.sql.functions._

import graft.api.FinData
import graft.sources.Generator

/** Smoke coverage of the reference-parity facade: every entry point a
  * reference user calls today runs end-to-end on generated bars.
  */
class FinDataSpec extends SparkSpec {

  private lazy val bars = Generator.ohlcv(spark, Seq("BTCUSDT", "ETHUSDT"), 300)

  test("validate_and_clean analog produces time features and valid OHLC") {
    val cleaned = FinData.validateAndClean(bars)
    assert(cleaned.columns.toSet.intersect(
      Set("hour", "day_of_week", "month", "year")).size == 4)
    assert(cleaned.filter(graft.operators.Cleaning.ohlcInvalid()).count() == 0)
  }

  test("normalize + inverse round-trips; aggregate across reference frames") {
    val n = FinData.normalizeOhlcv(bars, "zscore", Seq("close"))
    val back = FinData.inverseNormalize(n, "zscore", Seq("close"))
    val drift = back.join(bars.select(col("symbol"), col("ts"), col("close").as("c0")),
        Seq("symbol", "ts"))
      .agg(max(abs(col("close") - col("c0")))).collect().head.getDouble(0)
    assert(drift < 1e-9)
    val multi = FinData.aggregateMultiple(bars, Seq("5m", "1h", "1M"))
    assert(multi("5m").count() >= multi("1h").count())
    assert(multi.keySet == Set("5m", "1h", "1M"))
    // gap-fill path: filled calendar has at least the unfilled buckets
    val sparse = bars.filter(col("ts") < "2024-01-01 01:00:00" ||
      col("ts") >= "2024-01-01 03:00:00")
    val filled = FinData.aggregateOhlcv(sparse, "1h", fill = true)
    val unfilled = FinData.aggregateOhlcv(sparse, "1h", fill = false)
    assert(filled.count() > unfilled.count()) // hour-1/2 gap materialized
    assert(filled.filter(col("n_bars") === 0 && col("close").isNull).count() == 0)
  }

  test("indicators, splits, and query paths run") {
    val ind = FinData.calculateAllIndicators(bars)
    assert(Seq("sma_20", "ema_12", "rsi_14", "macd", "bb_upper", "atr_14")
      .forall(ind.columns.contains))
    val split = FinData.threeWaySplit(bars, 0.7, 0.15)
    assert(split.groupBy("split").count().count() == 3)
    val q = FinData.queryOhlcv(bars, "BTCUSDT", limit = Some(10))
    assert(q.count() == 10)
    val stats = FinData.symbolStats(bars, "ETHUSDT").collect().head
    assert(stats.getAs[Long]("record_count") == 300L)
    assert(FinData.latestTimestamp(bars, "BTCUSDT").collect().head.get(0) != null)
    val sw = FinData.slidingWindows(bars, window = 16, target = 4, stride = 8)
    assert(sw.select(size(col("x"))).distinct().collect().head.getInt(0) == 16)
    val qs = FinData.qualityScore(bars)
    assert(qs.count() == 2)
  }
}
