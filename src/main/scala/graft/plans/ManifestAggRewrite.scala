package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

import graft.sinks.ManifestFileIndex

/** Transparent metadata-only aggregates over snapshot-lake reads — the
  * Iceberg/Delta "stats-only scan" as an optimizer rule: a global
  * `count(*)` / `min(c)` / `max(c)` whose scan is a
  * [[ManifestFileIndex]] relation (`ManifestFileIndex.readPruned`) is
  * answered from the manifest's per-file row counts and min/max
  * envelopes and collapses to a [[LocalRelation]] — zero data files
  * opened, zero Spark jobs, at any lake size. The explicit API form is
  * [[graft.sinks.SnapshotLake.summary]]; this rule serves users who
  * just write the aggregate.
  *
  * Soundness gates — ANY miss falls back to the ordinary scan (the
  * rewrite may only change the plan, never the answer):
  *  - the aggregate is GLOBAL (no grouping) and sits on the relation
  *    through nothing but attribute-preserving projections — a Filter,
  *    Join, or computed projection underneath vetoes;
  *  - every aggregate is `count(<non-null literal>)` (count(*) shape;
  *    `count(col)` needs null counts the manifest doesn't carry),
  *    `min(col)` or `max(col)` on a bare attribute, no DISTINCT, no
  *    FILTER clause; expressions OVER the aggregates (max−min, casts)
  *    are folded after substitution;
  *  - every file in the pinned manifest carries an exact row count
  *    (legacy pre-`rows` manifests veto) and, for min/max, a recorded
  *    envelope on that column in every non-empty file — parquet footer
  *    min/max ignore NULLs exactly like SQL MIN/MAX, so partial-null
  *    files compose correctly, while an all-null or un-stats'd file has
  *    no envelope and vetoes;
  *  - the envelope's double domain must round-trip the column type
  *    EXACTLY: doubles/floats as themselves, integral and timestamp
  *    (micros) types only below 2^53 — a `min(bigint)` whose true value
  *    might have rounded in the stored double refuses rather than
  *    answers. Floating-point bounds of ±0.0 also veto: parquet-mr
  *    widens zero bounds across the sign (PARQUET-1222), sound for
  *    pruning but ambiguous as an exact answer. Files containing NaN
  *    get no footer min/max at all (PARQUET-1225), so a recorded
  *    envelope is NaN-free by construction.
  *
  * Registered via [[GraftExtensions]]; the Verify/Bench sessions carry
  * it, so `sn5_agg_rewrite` exercises the metadata path under the
  * DuckDB oracle (which computes the same aggregate over the rows).
  */
object ManifestAggRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate if agg.groupingExpressions.isEmpty =>
      unwrap(agg.child).flatMap { case (mfi, nameOf) =>
        tryRewrite(agg, mfi, nameOf)
      }.getOrElse(agg)
  }

  /** The ManifestFileIndex under `plan`, when reachable through only
    * attribute-preserving projections, plus the map from the plan's
    * output exprIds to the manifest column names they carry (a
    * `select(col("x").as("y"))` rename still prunes on x's envelope).
    */
  private def unwrap(plan: LogicalPlan)
      : Option[(ManifestFileIndex, Map[ExprId, String])] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case mfi: ManifestFileIndex =>
          Some((mfi, lr.output.map(a => a.exprId -> a.name).toMap))
        case _ => None
      }
      case _ => None
    }
    case Project(plist, child) =>
      unwrap(child).flatMap { case (mfi, names) =>
        val mapped: Seq[Option[(ExprId, String)]] = plist.map {
          case a: AttributeReference => names.get(a.exprId).map(a.exprId -> _)
          case al @ Alias(a: AttributeReference, _) =>
            names.get(a.exprId).map(al.exprId -> _)
          case _ => None
        }
        if (mapped.forall(_.isDefined)) Some((mfi, mapped.flatten.toMap))
        else None
      }
    case _ => None
  }

  private def tryRewrite(agg: Aggregate, mfi: ManifestFileIndex,
      nameOf: Map[ExprId, String]): Option[LogicalPlan] = {
    val entries = mfi.entries
    if (entries.exists(_.rows < 0)) return None // pre-rows manifest: no exact counts
    // position deletes make physical row counts an overcount and
    // envelopes a superset: no metadata answer (defense-in-depth — the
    // V1 relation already refuses delete-carrying manifests outright)
    if (entries.exists(_.deletes.nonEmpty)) return None
    val total = entries.map(_.rows).sum
    val nonEmpty = entries.filter(_.rows > 0)

    def minMax(a: Attribute, wantMin: Boolean): Option[Any] =
      nameOf.get(a.exprId).flatMap { name =>
        if (total == 0L) Some(null) // SQL MIN/MAX over empty input
        else {
          val perFile = nonEmpty.map(_.stats.get(name))
          if (perFile.exists(_.isEmpty)) None // a file lacks the envelope
          else fromStatsDomain(
            if (wantMin) perFile.map(_.get._1).min
            else perFile.map(_.get._2).max,
            a.dataType)
        }
      }

    def compute(ae: AggregateExpression): Option[Any] =
      if (ae.isDistinct || ae.filter.nonEmpty) None
      else ae.aggregateFunction match {
        case Count(Seq(l: Literal)) if l.value != null => Some(total)
        case Min(a: Attribute) => minMax(a, wantMin = true)
        case Max(a: Attribute) => minMax(a, wantMin = false)
        case _ => None
      }

    var ok = true
    val substituted = agg.aggregateExpressions.map { ne =>
      ne.transform {
        case ae: AggregateExpression =>
          compute(ae) match {
            case Some(v) => Literal(v, ae.dataType)
            case None => ok = false; ae
          }
      }
    }
    if (!ok) return None
    val values = substituted.map { e =>
      val stripped = e match { case Alias(c, _) => c; case other => other }
      if (stripped.references.nonEmpty || !stripped.deterministic) return None
      try stripped.eval(InternalRow.empty)
      catch { case _: Exception => return None }
    }
    Some(LocalRelation(agg.output, Seq(InternalRow.fromSeq(values))))
  }

  private val MaxExactLong = 9007199254740992.0 // 2^53

  /** The envelope's double converted back to the column type, only when
    * the conversion is provably exact (see the object doc's gates).
    */
  private def fromStatsDomain(d: Double, dt: DataType): Option[Any] = dt match {
    case DoubleType =>
      if (!d.isNaN && d != 0.0) Some(d) else None
    case FloatType =>
      if (!d.isNaN && d != 0.0 && d.toFloat.toDouble == d) Some(d.toFloat)
      else None
    case LongType | TimestampNTZType | TimestampType =>
      // any |long| < 2^53 round-trips the double exactly, and any long
      // >= 2^53+1 rounds to a double >= 2^53 — so a stored value
      // strictly below the bound IS the original
      if (math.abs(d) < MaxExactLong && d == math.rint(d)) Some(d.toLong)
      else None
    case IntegerType | DateType =>
      if (d == math.rint(d) && d >= Int.MinValue.toDouble &&
        d <= Int.MaxValue.toDouble) Some(d.toInt)
      else None
    case ShortType =>
      if (d == math.rint(d) && d >= Short.MinValue && d <= Short.MaxValue)
        Some(d.toShort)
      else None
    case ByteType =>
      if (d == math.rint(d) && d >= Byte.MinValue && d <= Byte.MaxValue)
        Some(d.toByte)
      else None
    case _ => None // decimals (unscaled-int stats), strings, binaries, …
  }
}
