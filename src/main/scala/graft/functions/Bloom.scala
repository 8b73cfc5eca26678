package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native codegen'd expression.
  *
  * WHY: Spark's own `BloomFilterMightContain` is an internal expression
  * the optimizer injects for runtime join filters — `InjectRuntimeFilter`
  * only fires when the CREATION side carries a selective predicate, which
  * a drop-list anti-join never has (the list IS the filter), so the
  * engine builds the filter explicitly and probes it map-side (see
  * [[graft.operators.Dedup.pruneDuplicatesBloom]]). The filter object
  * rides the expression via `addReferenceObj` (the [[PqEncode]] /
  * [[IvfAssignTopN]] discipline): the plan tree carries a pointer, not a
  * multi-megabyte literal, and the probe stays inside whole-stage
  * codegen — a Scala UDF here would box every id and break the codegen
  * span of the scan it guards.
  */
object Bloom {
  def mightContain(id: Column, bf: BloomFilter): Column =
    ColumnBridge.column(MightContainLong(ColumnBridge.expression(id), bf))
}

/** `might_contain(id long)` → boolean; false ⇒ the id is DEFINITELY not
  * in the set the filter was built over (the contract the definite-keep
  * branch of a bloom-pruned anti-join rests on).
  */
case class MightContainLong(child: Expression, bf: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_might_contain needs a bigint id, got $other")
  }

  override protected def nullSafeEval(v: Any): Any =
    bf.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("graftBloom", bf,
        classOf[BloomFilter].getName)
      s"${ev.value} = $ref.mightContainLong($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): MightContainLong =
    copy(child = newChild)
}
