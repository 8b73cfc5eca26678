package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

import graft.functions.Ema

/** Technical-indicator window operators (SURVEY.md §2.5, W1-W9) — the Spark
  * re-expression of the reference's `technical_indicators.py`.
  *
  * All indicators are per-series ordered computations over
  * [[Indicators.Series]] (partition = symbol..., order = ts...). The
  * reference runs on one symbol's pandas frame at a time; here every
  * indicator is multi-series by construction and the whole 13-column fan-out
  * ([[withIndicators]]) shares ONE window spec → one shuffle + one sort
  * regardless of how many indicator columns are appended. At 100 TB that
  * means the cost is a single `symbol`-hash exchange (AQE handles hot-symbol
  * skew), not 13 passes.
  *
  * Exactness discipline: rolling means/variances go through DECIMAL(38,10)
  * sums (order-independent, bit-identical to the DuckDB oracle — see
  * [[graft.functions]]); the EMA recurrence is a native Catalyst
  * [[graft.functions.Ema]] window function evaluated in a fixed order, so
  * IEEE double arithmetic matches the oracle's `list_reduce` fold exactly.
  *
  * Null-gating matches pandas `rolling(n)` min_periods: an indicator is NULL
  * until its frame holds n non-null inputs (reference
  * technical_indicators.py:12-15 NaN warm-up).
  */
object Indicators {

  /** One logical time-series axis: partition keys + intra-series order.
    * (No bounded-frame helper on purpose: Spark re-aggregates bounded
    * sliding frames per row — trailing-n aggregates go through
    * [[slidingDecSum]]/[[slidingCount]] instead.)
    */
  case class Series(partition: Seq[Column], order: Seq[Column]) {
    lazy val w: WindowSpec = Window.partitionBy(partition: _*).orderBy(order: _*)
  }

  private val Dec = "decimal(38,10)"

  /** Trailing-n sum/count as a DIFFERENCE of two unbounded-preceding
    * frames. Spark re-aggregates bounded sliding frames from scratch for
    * every row (O(n·frame) — frame(200) costs 200 decimal adds per row),
    * but unbounded-preceding frames are incremental (O(1)/row). Decimal
    * arithmetic is exact, so cum(i) − cum(i−n) is bit-identical to the
    * direct frame sum — the oracle SQL keeps the plain frame formulation.
    * (Trade-off: the running decimal grows with partition length; at
    * precision 38 scale 10 that's 10²⁸ headroom — centuries of 1-minute
    * bars.)
    */
  private def slidingDecSum(cDec: Column, n: Int, s: Series): Column = {
    val cum = s.w.rowsBetween(Window.unboundedPreceding, 0)
    val before = s.w.rowsBetween(Window.unboundedPreceding, -n)
    sum(cDec).over(cum) -
      coalesce(sum(cDec).over(before), lit(0).cast(Dec))
  }

  private def slidingCount(c: Column, n: Int, s: Series): Column = {
    val cum = s.w.rowsBetween(Window.unboundedPreceding, 0)
    val before = s.w.rowsBetween(Window.unboundedPreceding, -n)
    count(c).over(cum) - count(c).over(before)
  }

  /** W1 — simple moving average over the trailing n rows. NULL until the
    * frame holds n non-null values (pandas min_periods semantics,
    * reference technical_indicators.py:12-15).
    */
  def sma(c: Column, n: Int, s: Series): Column =
    when(slidingCount(c, n, s) === n,
      slidingDecSum(c.cast(Dec), n, s).cast("double") / lit(n.toDouble))

  /** W5 helper — rolling SAMPLE std-dev (pandas `rolling(n).std()`, ddof=1)
    * via exact decimal sum/sum-of-squares; final arithmetic in double with
    * the same expression tree as the oracle SQL.
    */
  def rollingStdSamp(c: Column, n: Int, s: Series): Column = {
    val sm = slidingDecSum(c.cast(Dec), n, s).cast("double")
    val sq = slidingDecSum((c * c).cast(Dec), n, s).cast("double")
    val nd = lit(n.toDouble)
    when(slidingCount(c, n, s) === n,
      sqrt((sq - sm * sm / nd) / (nd - lit(1.0))))
  }

  /** W2 — exponential moving average, `ewm(span=n, adjust=False)` semantics
    * (reference technical_indicators.py:17-20): y_0 = x_0,
    * y_t = α·x_t + (1−α)·y_{t−1}, α = 2/(n+1). NULL inputs decay the old
    * state's weight by position (pandas default `ignore_na=False`) — see
    * [[graft.functions.Ema]].
    */
  def ema(c: Column, span: Int, s: Series): Column =
    Ema.ema(c, span, s.partition, s.order)

  /** W2 fallback — EMA via typed `groupByKey(symbol).flatMapGroups` over a
    * time-sorted iterator (SURVEY §2.10's alternative to the Catalyst
    * window function; kept as the reference implementation for equivalence
    * testing and as the template for recurrences too irregular for a
    * window expression). Each group sorts in executor memory — for hot
    * symbols beyond memory, pre-bucket to (symbol, month) with carryover
    * state as §7.3.3 describes.
    */
  def emaViaGroups(df: org.apache.spark.sql.DataFrame, span: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val alpha = 2.0 / (span + 1.0)
    val in = df.select(col("symbol"), graft.functions.epochUs(col("ts")).as("ts_us"),
      col("close"))
    implicit val outEnc =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaDouble)
    in.as(Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaDouble))
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroups { (sym: String, rows: Iterator[(String, Long, Double)]) =>
        var state = Double.NaN
        rows.toSeq.sortBy(_._2).iterator.map { case (_, tsUs, x) =>
          state = if (state.isNaN) x else alpha * x + (1 - alpha) * state
          (sym, tsUs, state)
        }
      }
      .toDF("symbol", "ts_us", "ema")
  }

  /** W7 — percent change vs previous row (reference data_cleaner.py:368).
    * try_divide: a zero previous value yields NULL (matches DuckDB float
    * division; under ANSI mode a plain `/` would throw DIVIDE_BY_ZERO on
    * the dirty-bar zero prices).
    */
  def pctChange(c: Column, s: Series): Column =
    try_divide(c, lag(c, 1).over(s.w)) - lit(1.0)

  /** W8 — value diff vs previous row. */
  def diff(c: Column, s: Series): Column = c - lag(c, 1).over(s.w)

  /** W3 stage 1 — the gated rolling average gain / average loss columns
    * (pandas `rolling(n).mean()` over the split deltas, reference
    * technical_indicators.py:22-29). Exposed separately so callers can
    * STAGE them as named columns in one projection and derive the RSI
    * arithmetic in a second: Spark does not dedupe equivalent window
    * expressions across aliases, so referencing these trees 4× each in
    * the final CASE (as a single composed Column must) re-expands ~16
    * window aggregates — measured 3.6 s vs ≤1.5 s staged at sf0.1.
    */
  def rsiAverages(c: Column, n: Int, s: Series): (Column, Column) = {
    val delta = diff(c, s)
    val gain = when(delta.isNull, lit(null).cast("double"))
      .when(delta > 0, delta).otherwise(lit(0.0))
    val loss = when(delta.isNull, lit(null).cast("double"))
      .when(delta < 0, -delta).otherwise(lit(0.0))
    val nd = lit(n.toDouble)
    val avgGain = when(slidingCount(gain, n, s) === n,
      slidingDecSum(gain.cast(Dec), n, s).cast("double") / nd)
    val avgLoss = when(slidingCount(loss, n, s) === n,
      slidingDecSum(loss.cast(Dec), n, s).cast("double") / nd)
    (avgGain, avgLoss)
  }

  /** W3 stage 2 — RSI from already-staged average gain/loss. Pure
    * arithmetic (no window expressions), so repeated references are free
    * attribute reads. Edge cases mirror pandas arithmetic: loss=0 ∧
    * gain>0 → 100 (rs=∞); loss=0 ∧ gain=0 → NULL (0/0). The division is
    * guarded by the CASE order (lazy per-row), so ANSI divide-by-zero
    * never fires.
    */
  def rsiFromAverages(avgGain: Column, avgLoss: Column): Column =
    when(avgGain.isNull || avgLoss.isNull, lit(null).cast("double"))
      .when(avgLoss === 0 && avgGain > 0, lit(100.0))
      .when(avgLoss === 0 && avgGain === 0, lit(null).cast("double"))
      .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + avgGain / avgLoss))

  /** W3 — RSI(n), Cutler's variant, as a single composable Column.
    * PERF NOTE: this inlines [[rsiAverages]] into [[rsiFromAverages]]'s
    * CASE, so the window trees are re-expanded per reference — fine inside
    * a larger expression, but for a standalone RSI column prefer
    * [[withRsi]] (the staged two-projection form).
    */
  def rsi(c: Column, n: Int, s: Series): Column = {
    val (avgGain, avgLoss) = rsiAverages(c, n, s)
    rsiFromAverages(avgGain, avgLoss)
  }

  /** W3, staged: appends `out` to `df` via two projections — the gated
    * averages once as named columns, then the CASE over attribute refs.
    * Bit-identical to [[rsi]] (same expression trees, same evaluation),
    * ~4 window aggregates instead of ~16.
    */
  def withRsi(df: DataFrame, c: Column, n: Int, s: Series, out: String): DataFrame = {
    val (g, l) = rsiAverages(c, n, s)
    df.select(col("*"), g.as("__avg_gain"), l.as("__avg_loss"))
      .withColumn(out, rsiFromAverages(col("__avg_gain"), col("__avg_loss")))
      .drop("__avg_gain", "__avg_loss")
  }

  /** W5, staged: appends bb_middle/bb_upper/bb_lower via two projections —
    * the rolling mean and sample std once as named columns, then the band
    * arithmetic over attribute refs (reference technical_indicators.py
    * bollinger_bands). Same alias-once rationale as [[withRsi]]: a single
    * select referencing `mid` 3× and `sd` 2× re-expands ~5× the window
    * aggregates (measured 8.8 s vs ≤1.5 s staged at sf0.1).
    */
  def withBollinger(df: DataFrame, c: Column, n: Int, s: Series): DataFrame =
    df.select(col("*"),
        sma(c, n, s).as("bb_middle"),
        rollingStdSamp(c, n, s).as("bb_std"))
      .withColumn("bb_upper", col("bb_middle") + lit(2.0) * col("bb_std"))
      .withColumn("bb_lower", col("bb_middle") - lit(2.0) * col("bb_std"))
      .drop("bb_std")

  /** W6 helper — true range: max(h−l, |h−close₋₁|, |l−close₋₁|); first row
    * of a series falls back to h−l (pandas skipna max over the NaN shifts,
    * reference technical_indicators.py:61-68).
    */
  def trueRange(high: Column, low: Column, close: Column, s: Series): Column = {
    val pc = lag(close, 1).over(s.w)
    when(pc.isNull, high - low)
      .otherwise(greatest(high - low, abs(high - pc), abs(low - pc)))
  }

  /** W6 — ATR(n) = SMA_n(TR) (reference technical_indicators.py:61-71). */
  def atr(high: Column, low: Column, close: Column, n: Int, s: Series): Column = {
    val tr = trueRange(high, low, close, s)
    when(slidingCount(tr, n, s) === n,
      slidingDecSum(tr.cast(Dec), n, s).cast("double") / lit(n.toDouble))
  }

  /** Beyond-reference — classic Wilder RSI: RMA (alpha=1/n) smoothing of
    * gains/losses instead of the reference's simple-MA Cutler variant.
    * NULL until a delta exists; loss-free stretches → 100 (rs=∞ in double).
    */
  def rsiWilder(c: Column, n: Int, s: Series): Column = {
    val (ag, al) = rsiWilderAverages(c, n, s)
    rsiFromAverages(ag, al)
  }

  /** Wilder stage 1 — RMA-smoothed gain/loss, stageable like
    * [[rsiAverages]] (same alias-once rationale; the final CASE is the
    * shared [[rsiFromAverages]]).
    */
  def rsiWilderAverages(c: Column, n: Int, s: Series): (Column, Column) = {
    val delta = diff(c, s)
    val gain = when(delta.isNull, lit(null).cast("double"))
      .when(delta > 0, delta).otherwise(lit(0.0))
    val loss = when(delta.isNull, lit(null).cast("double"))
      .when(delta < 0, -delta).otherwise(lit(0.0))
    (Ema.rma(gain, n, s.partition, s.order),
     Ema.rma(loss, n, s.partition, s.order))
  }

  /** Beyond-reference — classic Wilder ATR: RMA(TR) instead of SMA(TR). */
  def atrWilder(high: Column, low: Column, close: Column, n: Int, s: Series): Column =
    Ema.rma(trueRange(high, low, close, s), n, s.partition, s.order)

  /** W9 — the reference's `calculate_all` fan-out
    * (technical_indicators.py:83-122): 13 indicator columns in one pass.
    * All exprs share one window spec, so the physical plan is a single
    * Exchange + Sort feeding the Window operators (the MACD-signal EMA needs
    * a second Window op over the already-sorted output — no extra shuffle).
    */
  def withIndicators(df: DataFrame, partition: Seq[Column], order: Seq[Column]): DataFrame = {
    val s = Series(partition, order)
    val c = col("close")
    // ONE select for every stage-1 indicator: a withColumn chain extracts
    // window expressions per projection layer and CollapseWindow only
    // merges ADJACENT same-spec nodes, leaving 12 sequential WindowExec
    // buffer passes; a single projection lets ExtractWindowExpressions
    // group globally by (spec, frame) — measured 12 → 7 Window nodes and
    // ~2× on the w9 fan-out. Expression trees are unchanged (bit-identical
    // output); bb_middle IS sma_20, stated once.
    val sma20 = sma(c, 20, s)
    val (avgGain, avgLoss) = rsiAverages(c, 14, s)
    val stage1 = df.select(col("*"),
        sma20.as("sma_20"),
        sma(c, 50, s).as("sma_50"),
        sma(c, 200, s).as("sma_200"),
        ema(c, 12, s).as("ema_12"),
        ema(c, 26, s).as("ema_26"),
        avgGain.as("__avg_gain"),
        avgLoss.as("__avg_loss"),
        sma20.as("bb_middle"),
        rollingStdSamp(c, 20, s).as("bb_std"),
        atr(col("high"), col("low"), c, 14, s).as("atr_14"))
      .withColumn("rsi_14",
        rsiFromAverages(col("__avg_gain"), col("__avg_loss")))
      .withColumn("macd", col("ema_12") - col("ema_26"))
    stage1
      .withColumn("macd_signal", ema(col("macd"), 9, s))
      .withColumn("macd_hist", col("macd") - col("macd_signal"))
      .withColumn("bb_upper", col("bb_middle") + lit(2.0) * col("bb_std"))
      .withColumn("bb_lower", col("bb_middle") - lit(2.0) * col("bb_std"))
      .drop("bb_std", "__avg_gain", "__avg_loss")
  }
}
