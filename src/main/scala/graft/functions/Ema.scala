package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Exponential moving average as a native Catalyst window function.
  *
  * Semantics match the reference's `ewm(span=n, adjust=False).mean()`
  * (reference technical_indicators.py:17-20):
  *   y_0 = x_0;  y_t = alpha * x_t + (1 - alpha) * y_{t-1},  alpha = 2/(n+1).
  * NULL inputs carry the previous state forward (pandas ewm ignores NaN).
  *
  * This recurrence has per-row output over ordered rows, which no built-in
  * frame aggregate expresses (SURVEY.md §2.10). As an
  * [[AggregateWindowFunction]] it evaluates incrementally over the running
  * row frame — O(1) state per row, one pass over each sorted partition, and
  * it composes with any `Window.partitionBy(...).orderBy(...)` so multi-
  * series EMA is a single shuffle at any scale.
  */
case class Ema(input: Expression, alpha: Expression)
    extends AggregateWindowFunction {

  override def children: Seq[Expression] = Seq(input, alpha)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ema"

  private lazy val state =
    AttributeReference("ema_state", DoubleType, nullable = true)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(state)

  override val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType))

  override val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(input), state,
      If(IsNull(state), input,
        Add(Multiply(alpha, input), Multiply(Subtract(Literal(1.0), alpha), state))))
  )

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
    */
  def ema(c: Column, span: Int, partition: Seq[Column], order: Seq[Column]): Column = {
    require(span >= 1, s"ema span must be >= 1, got $span")
    emaAlpha(c, 2.0 / (span + 1.0), partition, order)
  }

  def emaAlpha(c: Column, alpha: Double, partition: Seq[Column], order: Seq[Column]): Column =
    ColumnBridge.windowColumn(
      Ema(Cast(ColumnBridge.expression(c), DoubleType), Literal(alpha)),
      partition, order)

  /** Wilder smoothing (RMA): alpha = 1/n, first-value seed — the smoother
    * classic RSI/ATR use (vs the reference's simple-MA Cutler RSI).
    */
  def rma(c: Column, n: Int, partition: Seq[Column], order: Seq[Column]): Column = {
    require(n >= 1, s"rma n must be >= 1, got $n")
    emaAlpha(c, 1.0 / n, partition, order)
  }
}
