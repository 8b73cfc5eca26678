package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Exponential moving average as a native Catalyst window function.
  *
  * Semantics match the reference's `ewm(span=n, adjust=False).mean()`
  * (reference technical_indicators.py:17-20):
  *   y_0 = x_0;  y_t = alpha * x_t + (1 - alpha) * y_{t-1},  alpha = 2/(n+1).
  *
  * NULL handling follows pandas' `ignore_na` exactly:
  *   - ignoreNa = false (pandas/reference DEFAULT): a null consumes a
  *     position — the old state's relative weight keeps decaying through
  *     the gap, so the next valid value is
  *     y = ((1-a)^k·y + a·x) / ((1-a)^k + a) after k positions since the
  *     last valid one (pandas ewm old_wt recurrence).
  *   - ignoreNa = true: nulls are skipped entirely; state carries
  *     unchanged (relative weights based on valid positions only).
  *   On a gap-free series the two are identical, and the gap-free path
  *   uses the plain recurrence verbatim (guarded by old_wt == 1), keeping
  *   results bit-identical to the un-gapped formula — no (1-a)+a ≈ 1
  *   round-off enters unless a gap actually occurred.
  *
  * This recurrence has per-row output over ordered rows, which no built-in
  * frame aggregate expresses (SURVEY.md §2.10). As an
  * [[AggregateWindowFunction]] it evaluates incrementally over the running
  * row frame — O(1) state per row, one pass over each sorted partition, and
  * it composes with any `Window.partitionBy(...).orderBy(...)` so multi-
  * series EMA is a single shuffle at any scale.
  */
case class Ema(input: Expression, alpha: Expression, ignoreNa: Boolean = false)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(input, alpha)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ema"

  private lazy val state =
    AttributeReference("ema_state", DoubleType, nullable = true)()
  private lazy val oldWt =
    AttributeReference("ema_old_wt", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(state, oldWt)

  override val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType), Literal(1.0))

  private val oneMinusAlpha = Subtract(Literal(1.0), alpha)

  override val updateExpressions: Seq[Expression] = {
    val plain = Add(Multiply(alpha, input),
      Multiply(oneMinusAlpha, state))
    val decayed = Multiply(oldWt, oneMinusAlpha)
    val weighted = Divide(
      Add(Multiply(decayed, state), Multiply(alpha, input)),
      Add(decayed, alpha))
    val nextState = If(IsNull(input), state,
      If(IsNull(state), input,
        if (ignoreNa) plain
        else If(EqualTo(oldWt, Literal(1.0)), plain, weighted)))
    val nextOldWt =
      if (ignoreNa) Literal(1.0)
      else If(IsNull(input),
        If(IsNull(state), oldWt, Multiply(oldWt, oneMinusAlpha)),
        Literal(1.0))
    Seq(nextState, nextOldWt)
  }

  override val evaluateExpression: Expression = state

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Ema =
    copy(input = newChildren(0), alpha = newChildren(1))
}

/** Wilder smoothing (RMA), the EMA variant used by classic ATR/RSI:
  * alpha = 1/n but the seed is the value itself (same recurrence shape).
  * Exposed for beyond-reference completeness.
  */
object Ema {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** EMA of `c` over each (partition, order) series; alpha = 2/(n+1).
    * Partition/order are passed explicitly because `Column.over` cannot
    * attach a custom window function in Spark 4 (see
    * [[org.apache.spark.sql.graftbridge.ColumnBridge.windowColumn]]).
    * `ignoreNa` as in pandas ewm (default false = reference semantics).
    */
  def ema(c: Column, span: Int, partition: Seq[Column], order: Seq[Column],
      ignoreNa: Boolean = false): Column = {
    require(span >= 1, s"ema span must be >= 1, got $span")
    emaAlpha(c, 2.0 / (span + 1.0), partition, order, ignoreNa)
  }

  def emaAlpha(c: Column, alpha: Double, partition: Seq[Column], order: Seq[Column],
      ignoreNa: Boolean = false): Column =
    ColumnBridge.windowColumn(
      Ema(Cast(ColumnBridge.expression(c), DoubleType), Literal(alpha), ignoreNa),
      partition, order)

  /** Wilder smoothing (RMA): alpha = 1/n, first-value seed — the smoother
    * classic RSI/ATR use (vs the reference's simple-MA Cutler RSI).
    */
  def rma(c: Column, n: Int, partition: Seq[Column], order: Seq[Column]): Column = {
    require(n >= 1, s"rma n must be >= 1, got $n")
    emaAlpha(c, 1.0 / n, partition, order)
  }
}
