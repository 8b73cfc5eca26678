package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Indicators
import graft.functions.Ema

/** Invariants from the reference's tests (SURVEY.md §5,
  * tests/units/test_processing.py) plus EMA recurrence checks against an
  * in-memory reference fold.
  */
class IndicatorsSpec extends SparkSpec {

  test("native EMA window function equals the flatMapGroups fallback") {
    import org.apache.spark.sql.functions._
    val bars = graft.sources.Generator.ohlcv(spark, Seq("aa", "bb"), 500)
    val native = bars.select(col("symbol"),
        graft.functions.epochUs(col("ts")).as("ts_us"),
        graft.functions.Ema.ema(col("close"), 12,
          Seq(col("symbol")), Seq(col("ts"))).as("ema"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val grouped = graft.operators.Indicators.emaViaGroups(bars, 12)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(native.keySet == grouped.keySet)
    native.foreach { case (k, v) => assert(v == grouped(k), s"at $k") }
  }
  import spark.implicits._

  private lazy val series: Seq[Double] =
    (1 to 300).map(i => 100.0 + 10.0 * math.sin(i / 7.0) + (i % 13) * 0.5)

  private lazy val df = series.zipWithIndex
    .map { case (v, i) => (i.toLong, "A", v) }
    .toDF("i", "symbol", "close")

  private val s = Indicators.Series(Seq($"symbol"), Seq($"i"))

  private def refEma(xs: Seq[Double], span: Int): Seq[Double] = {
    val a = 2.0 / (span + 1.0)
    xs.tail.scanLeft(xs.head)((acc, x) => a * x + (1.0 - a) * acc)
  }

  test("EMA matches the adjust=False recurrence exactly") {
    val got = df.select(Ema.ema($"close", 12, Seq($"symbol"), Seq($"i"))).as[Double].collect().toSeq
    val want = refEma(series, 12)
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, e) => assert(g == e, s"ema mismatch: $g vs $e") }
  }

  test("EMA null gaps decay weights by position (pandas ignore_na=False)") {
    val withNulls = Seq((0L, None), (1L, Some(10.0)), (2L, None), (3L, Some(20.0)))
      .toDF("i", "x")
    val got = withNulls
      .select(Ema.ema($"x", 3, Nil, Seq($"i"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    // alpha = 0.5: seed 10; null outputs 10 but decays its weight to
    // (1-a)=0.5; next valid: ((0.5*0.5)*10 + 0.5*20)/(0.25+0.5) = 16.666…
    // — pandas ewm(span=3, adjust=False).mean() on [NaN, 10, NaN, 20]
    assert(got.toSeq == Seq(None, Some(10.0), Some(10.0),
      Some((0.25 * 10.0 + 0.5 * 20.0) / 0.75)))
  }

  test("EMA ignoreNa=true carries state unchanged through nulls") {
    val withNulls = Seq((0L, None), (1L, Some(10.0)), (2L, None), (3L, Some(20.0)))
      .toDF("i", "x")
    val got = withNulls
      .select(Ema.ema($"x", 3, Nil, Seq($"i"), ignoreNa = true)).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    // alpha = 0.5: seed 10, null keeps 10 at full weight, then 15
    assert(got.toSeq == Seq(None, Some(10.0), Some(10.0), Some(15.0)))
  }

  test("SMA has exactly n-1 leading nulls and equals the arithmetic mean") {
    val got = df.select(Indicators.sma($"close", 20, s)).collect()
    assert(got.take(19).forall(_.isNullAt(0)))
    assert(!got(19).isNullAt(0))
    val want = series.take(20).sum / 20.0
    assert(math.abs(got(19).getDouble(0) - want) < 1e-9)
  }

  test("RSI stays within [0, 100] after warm-up") {
    val vals = df.select(Indicators.rsi($"close", 14, s)).collect()
    assert(vals.take(14).forall(_.isNullAt(0)))
    val defined = vals.drop(14).map(_.getDouble(0))
    assert(defined.nonEmpty && defined.forall(v => v >= 0.0 && v <= 100.0))
  }

  test("Bollinger bands are ordered lower <= middle <= upper") {
    val mid = Indicators.sma($"close", 20, s)
    val sd = Indicators.rollingStdSamp($"close", 20, s)
    val rows = df.select(mid.as("m"), (mid + lit(2.0) * sd).as("u"),
      (mid - lit(2.0) * sd).as("l")).na.drop().as[(Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (m, u, l) => assert(l <= m && m <= u) }
  }

  test("ATR is positive and null-gated for the first n-1 rows") {
    val bars = df
      .withColumn("high", $"close" * 1.01)
      .withColumn("low", $"close" * 0.99)
    val vals = bars.select(Indicators.atr($"high", $"low", $"close", 14, s)).collect()
    assert(vals.take(13).forall(_.isNullAt(0)))
    assert(vals.drop(13).forall(r => r.getDouble(0) > 0.0))
  }

  test("indicator fan-out plans a single Exchange for all 13 columns") {
    val bars = df
      .withColumn("high", $"close" * 1.01)
      .withColumn("low", $"close" * 0.99)
    val out = Indicators.withIndicators(bars, Seq($"symbol"), Seq($"i"))
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
    assert(out.columns.count(_.startsWith("sma_")) == 3)
    assert(out.count() == 300)
  }
}
