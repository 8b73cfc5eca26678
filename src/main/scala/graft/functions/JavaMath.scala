package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Natural log via `java.lang.Math.log` (JIT-intrinsified, matches glibc
  * libm — and therefore DuckDB — bit-for-bit on every tested input), unlike
  * Spark's built-in `log` which routes through `StrictMath.log` and differs
  * by 1 ulp on ~3% of inputs, breaking bit-exact oracle hashes.
  * Codegen-friendly: participates in whole-stage codegen like any built-in.
  */
case class JavaLog(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jlog"

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Math.log(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.log($c)")

  override protected def withNewChildInternal(newChild: Expression): JavaLog =
    copy(child = newChild)
}

object JavaMath {
  /** `ln(c)` with java.lang.Math/libm rounding (see [[JavaLog]]). */
  def jlog(c: Column): Column =
    ColumnBridge.column(JavaLog(Cast(ColumnBridge.expression(c), DoubleType)))
}
