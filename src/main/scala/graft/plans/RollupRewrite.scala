package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.LongType

/** Continuous-aggregate rewrite (SURVEY §4.3.4) — the Spark analogue of a
  * TimescaleDB continuous aggregate serving queries on the raw hypertable:
  * an OHLCV `groupBy(symbol, window(ts, coarse))` whose scan reads a
  * REGISTERED raw source is rewritten to aggregate the registered roll-up
  * instead, whenever the roll-up's frequency strictly divides the query's.
  * A 1-hour resample over a year of 1-minute bars then reads the 15-minute
  * roll-up table: 1/15th the scan, identical results.
  *
  * Soundness model (the same contract as a cagg): [[RollupCatalog.register]]
  * asserts "this bars-shaped table IS the `stepUs` roll-up of the bars
  * pipeline over this raw path". The rule itself guarantees, structurally:
  *
  *  - the aggregate is OHLCV-decomposable AND role-matched to how each
  *    roll-up column was materialized: max only over high, min only over
  *    low, sum only over volume, min_by/max_by(·, ts) only over
  *    open/close (first/last compose across levels because the earliest
  *    raw row lives in the earliest fine bucket), and `count(1)`, which
  *    is re-expressed as `sum(n_bars)`. Anything else — avg, count
  *    distinct, filter clauses, UDAFs, or a composing function applied
  *    to the WRONG column (max(open), sum(close), min(ts)…) — vetoes
  *    the rewrite, because bucket-level values don't reproduce it.
  *  - the window is tumbling, epoch-aligned, with `rollup.stepUs`
  *    strictly dividing the query step — bucket edges provably coincide.
  *  - every column the aggregate touches exists, with the same type, in
  *    the roll-up.
  *
  * One documented numeric caveat: the roll-up materializes its
  * decimal-exact volume sum as a double, so re-aggregating sums those
  * rounded doubles — exact whenever per-bucket sums are exactly
  * representable (integral volumes; < 2⁵³), else equal to the raw result
  * within one rounding per level.
  */
object RollupRewrite extends Rule[LogicalPlan] {

  /** Marks rewritten aggregates so fixed-point optimizer batches don't
    * re-match the (structurally similar) replacement plan.
    */
  private val Rewritten = TreeNodeTag[Boolean]("graft.rollup.rewritten")

  /** Columns a registered roll-up must expose (bars-shaped + n_bars). */
  val RollupCols: Seq[String] =
    Seq("symbol", "ts", "open", "high", "low", "close", "volume", "n_bars")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (RollupCatalog.entries.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate if agg.getTagValue(Rewritten).isEmpty =>
        tryRewrite(agg).getOrElse(agg)
    }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = agg.child match {
    case proj @ Project(plist, _) =>
      for {
        // exactly one windowed-bucket alias; everything else may be the
        // (collapsed) bars derivation — it gets REPLACED by roll-up columns
        windowAlias <- plist.collectFirst {
          case a: Alias if a.name == "window" && a.references.size == 1 => a
        }
        stepUs <- tumblingStepUs(windowAlias.child)
        tsAttr = windowAlias.references.head
        relation <- singleRelation(proj)
        entry <- RollupCatalog.lookup(relationPaths(relation), stepUs)
        rewritten <- rewrite(agg, proj, windowAlias, tsAttr, entry)
      } yield rewritten
    case _ => None
  }

  /** The analyzer expands `window(ts, iv)` into floor arithmetic whose
    * positive literals are exactly the slide and duration (both in µs) —
    * equal for a tumbling window — plus zeros for the epoch start offset.
    * A sliding window or a shifted origin yields a second distinct
    * positive literal and vetoes the rewrite.
    */
  private def tumblingStepUs(windowExpr: Expression): Option[Long] = {
    val positives = windowExpr.collect {
      case Literal(v: Long, LongType) if v > 0 => v
    }.toSet
    if (positives.size == 1) Some(positives.head) else None
  }

  private def singleRelation(plan: LogicalPlan): Option[LogicalRelation] =
    plan.collectLeaves() match {
      case Seq(lr: LogicalRelation) => Some(lr)
      case _ => None
    }

  private def relationPaths(lr: LogicalRelation): Set[String] = lr.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString).toSet
    case _ => Set.empty
  }

  private def rewrite(agg: Aggregate, proj: Project, windowAlias: Alias,
      tsAttr: Attribute, entry: RollupCatalog.Entry): Option[LogicalPlan] = {
    val rollupAttrs: Map[String, Attribute] =
      entry.rollup.output.map(a => a.name -> a).toMap

    // every projected column the aggregate (or the window) consumes must
    // map, by name and type, onto a roll-up column
    val windowAttr = agg.groupingExpressions.collectFirst {
      case a: Attribute if a.exprId == windowAlias.exprId => a
    }
    val needed: Seq[Attribute] = (agg.references ++ windowAlias.references)
      .filterNot(a => windowAttr.exists(_.exprId == a.exprId))
      .toSeq.distinct
      .map { a =>
        proj.projectList.collectFirst {
          case out if out.exprId == a.exprId => out.toAttribute
        }.getOrElse(return None)
      }
    if (!needed.forall(a =>
        rollupAttrs.get(a.name).exists(_.dataType == a.dataType))) return None
    // remaining grouping keys (symbol, …) must be plain mapped attributes
    val groupOk = agg.groupingExpressions.forall {
      case a: Attribute =>
        windowAttr.exists(_.exprId == a.exprId) || rollupAttrs.contains(a.name)
      case _ => false
    }
    if (!groupOk) return None

    // level 1: roll-up columns take over the raw attributes' exprIds, so
    // the window alias and every aggregate expression re-resolve unchanged
    val nBars = Alias(rollupAttrs("n_bars"), "__rollup_n_bars")()
    val level1 = Project(
      needed.map(a => Alias(rollupAttrs(a.name), a.name)(exprId = a.exprId)) :+ nBars,
      entry.rollup)
    val level2 = Project(Seq(windowAlias) ++ needed :+ nBars.toAttribute, level1)

    // Whitelist pass, tied to the roll-up columns' ROLES — an aggregate
    // composes across levels only when it re-applies the function the
    // roll-up column was materialized with: max only over high (bucket
    // max-of-maxes IS the raw max), min only over low, sum only over
    // volume (sum of bucket sums), min_by/max_by(·, ts) only over
    // open/close (the earliest raw row lives in the earliest bucket, and
    // any POINTWISE value expr commutes with "take the first"), count(1)
    // as sum(n_bars). max(open), sum(close), min(ts) etc. do NOT compose
    // and must veto. Sum/Min/Max inputs are restricted to the bare column
    // through casts (sum of f(volume) ≠ f-sum composition unless linear).
    def bareThroughCasts(e: Expression, colName: String): Boolean = e match {
      case a: Attribute => a.name == colName
      case c: Cast => bareThroughCasts(c.child, colName)
      case _ => false
    }
    def refsOnly(e: Expression, colName: String): Boolean =
      e.references.forall(_.name == colName) && e.references.nonEmpty
    val byTs = (ord: Expression) => ord.references == AttributeSet(Seq(tsAttr))
    var ok = true
    val newAggExprs = agg.aggregateExpressions.map { ne =>
      ne.transform {
        case ae @ AggregateExpression(fn, _, isDistinct, filter, _) =>
          if (isDistinct || filter.nonEmpty) { ok = false; ae }
          else fn match {
            case Max(c) if bareThroughCasts(c, "high") => ae
            case Min(c) if bareThroughCasts(c, "low") => ae
            case Sum(c, _) if bareThroughCasts(c, "volume") => ae
            case MinBy(v, ord) if byTs(ord) && refsOnly(v, "open") => ae
            case MaxBy(v, ord) if byTs(ord) && refsOnly(v, "close") => ae
            case Count(Seq(Literal(1, _))) =>
              ae.copy(aggregateFunction = Sum(nBars.toAttribute))
            case _ => ok = false; ae
          }
      }.asInstanceOf[NamedExpression]
    }
    if (!ok) return None

    val out = Aggregate(agg.groupingExpressions, newAggExprs, level2)
    out.setTagValue(Rewritten, true)
    Some(out)
  }
}

/** Session-wide registry of materialized roll-ups, keyed by the raw
  * source's file paths — the cagg catalog. `register` validates the
  * bars+n_bars shape; `lookup` returns the FINEST roll-up whose step
  * strictly divides the query step (finest ⇒ buckets always compose, and
  * strictness keeps a roll-up's own defining query from matching itself).
  */
object RollupCatalog {

  final case class Entry(rawPaths: Set[String], stepUs: Long, rollup: LogicalPlan)

  @volatile private[plans] var entries: Seq[Entry] = Nil

  /** Declare `rollup` to be the `stepUs` OHLCV roll-up of the bars
    * pipeline scanning `raw`'s file source. The roll-up must expose
    * [[RollupRewrite.RollupCols]] (rename `bucket_ts` to `ts`).
    */
  def register(raw: DataFrame, stepUs: Long, rollup: DataFrame): Unit = {
    val missing = RollupRewrite.RollupCols.filterNot(rollup.columns.contains)
    require(missing.isEmpty, s"roll-up is missing columns: ${missing.mkString(", ")}")
    require(stepUs > 0, "stepUs must be positive")
    val paths = raw.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
      case _ => Nil
    }.toSet
    require(paths.nonEmpty, "raw source has no file-based relation to key on")
    val pruned = rollup.select(RollupRewrite.RollupCols.map(rollup.col): _*)
    entries = entries :+ Entry(paths, stepUs, pruned.queryExecution.optimizedPlan)
  }

  def clear(): Unit = entries = Nil

  private[plans] def lookup(paths: Set[String], queryStepUs: Long): Option[Entry] =
    entries.filter(e => e.rawPaths == paths && e.stepUs < queryStepUs &&
        queryStepUs % e.stepUs == 0)
      .sortBy(_.stepUs).headOption
}
