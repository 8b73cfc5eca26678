package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, DecimalType, LongType}

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
  * pipeline over this raw path" — including, for every optional exact
  * column it carries, that `sum_<c>` = `sum(CAST(c AS DECIMAL(38,10)))`,
  * `sum2_<c>` = `sum(CAST(c*c AS DECIMAL(38,10)))` and `n_<c>` = `count(c)`
  * per bucket ([[graft.functions.exactSumDec]] / `exactSumSqDec`). The rule
  * itself guarantees, structurally:
  *
  *  - the aggregate is OHLCV-decomposable AND role-matched to how each
  *    roll-up column was materialized: max only over high, min only over
  *    low, min_by/max_by(·, bare ts) only over open/close (first/last
  *    compose across levels because the earliest raw row lives in the
  *    earliest fine bucket — and only when `symbol` is a grouping key, so
  *    bucket timestamps are tie-free within each output group), and
  *    `count(1)`, re-expressed as `sum(n_bars)`. Decimal-cast sums —
  *    `sum(CAST(c AS DECIMAL))`, `sum(CAST(c*c AS DECIMAL))` — and
  *    non-null counts `count(c)` are served from the roll-up's matching
  *    `sum_<c>` / `sum2_<c>` / `n_<c>` columns when present (this is what
  *    makes [[graft.functions.exactSum]]/`exactAvg`/`exactVarSamp`-shaped
  *    aggregates serve), and decimal addition is associative, so the
  *    re-aggregated value is BIT-IDENTICAL to the raw result — no
  *    per-level rounding. Anything else — plain double sums (one rounding
  *    per level, order-dependent), avg, count distinct, filter clauses,
  *    UDAFs, or a composing function applied to the WRONG column
  *    (max(open), min(ts)…) — vetoes the rewrite, because bucket-level
  *    values don't reproduce it exactly.
  *  - the window is tumbling, epoch-aligned (any negative literal in the
  *    analyzer's expansion — a shifted `startTime` — vetoes), with
  *    `rollup.stepUs` strictly dividing the query step — bucket edges
  *    provably coincide.
  *  - grouping keys beyond the window are restricted to `symbol`: it is a
  *    grouping key of the roll-up itself, so each roll-up row lands in
  *    exactly one output group. Any other grouping attribute (ts, close,
  *    …) is row-level on the raw source but bucket-level on the roll-up —
  *    different groups — and vetoes.
  *  - every column the aggregate touches exists, with the same type, in
  *    the roll-up.
  */
object RollupRewrite extends Rule[LogicalPlan] {

  /** Marks rewritten aggregates so fixed-point optimizer batches don't
    * re-match the (structurally similar) replacement plan.
    */
  private val Rewritten = TreeNodeTag[Boolean]("graft.rollup.rewritten")

  /** Columns a registered roll-up must expose (bars-shaped + n_bars). */
  val RollupCols: Seq[String] =
    Seq("symbol", "ts", "open", "high", "low", "close", "volume", "n_bars")

  /** Raw columns whose exact-composition companions a roll-up MAY carry:
    * `sum_<c>` (decimal bucket sum), `sum2_<c>` (decimal bucket sum of
    * squares), `n_<c>` (non-null count). These are what Sum/avg/stddev
    * queries are served from; without them such queries veto.
    */
  val ExactBaseCols: Seq[String] = Seq("open", "high", "low", "close", "volume")

  /** The recognized optional exact-composition column names present in
    * `cols`, in a stable order.
    */
  def exactColsIn(cols: Seq[String]): Seq[String] =
    cols.filter(c => ExactBaseCols.exists(b =>
      c == s"sum_$b" || c == s"sum2_$b" || c == s"n_$b"))

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
    * nonzero Long literals are exactly the slide and duration (both in µs)
    * — equal for a tumbling window — plus zeros for the epoch start offset.
    * A sliding window or a positively-shifted origin yields a second
    * distinct positive literal; a NEGATIVE `startTime` (legal in Spark,
    * e.g. `window(ts, "1 hour", "1 hour", "-7 minutes")` for timezone
    * alignment) contributes a negative literal. Either shifts bucket edges
    * off the roll-up's epoch lattice, so any literal set other than
    * exactly-one-positive-value vetoes.
    */
  private def tumblingStepUs(windowExpr: Expression): Option[Long] = {
    val lits = windowExpr.collect {
      case Literal(v: Long, LongType) if v != 0 => v
    }.toSet
    if (lits.size == 1 && lits.head > 0) Some(lits.head) else None
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
    val aggNeeded: Seq[Attribute] = agg.references
      .filterNot(a => windowAttr.exists(_.exprId == a.exprId))
      .toSeq.distinct
      .map { a =>
        proj.projectList.collectFirst {
          case out if out.exprId == a.exprId => out.toAttribute
        }.getOrElse(return None)
      }
    // ts is consumed INSIDE the window alias, so column pruning may have
    // dropped it from the projection — it still must exist in the roll-up
    // (level1 re-aliases it under the raw exprId for the window to resolve)
    val needed: Seq[Attribute] =
      if (aggNeeded.exists(_.exprId == tsAttr.exprId)) aggNeeded
      else aggNeeded :+ tsAttr
    if (!needed.forall(a =>
        rollupAttrs.get(a.name).exists(_.dataType == a.dataType))) return None
    // grouping keys beyond the window must be `symbol` — the roll-up's own
    // grouping key, hence bucket-constant. Any other attribute (ts, close…)
    // would remap a row-level grouping key onto a bucket-level column.
    val groupOk = agg.groupingExpressions.forall {
      case a: Attribute =>
        windowAttr.exists(_.exprId == a.exprId) || a.name == "symbol"
      case _ => false
    }
    if (!groupOk) return None
    // first/last (min_by/max_by on ts) compose only when each output group
    // holds ONE symbol's bucket rows: then bucket timestamps are distinct
    // and the earliest fine bucket uniquely carries the earliest raw row.
    // Without symbol in the grouping, two symbols' buckets tie on ts and
    // the argmin is ambiguous at the bucket level.
    val hasSymbolGroup = agg.groupingExpressions.exists {
      case a: Attribute => a.name == "symbol"
      case _ => false
    }

    // Aliases for roll-up-only columns (n_bars + exact-composition
    // columns) that rewritten aggregates reference; only those actually
    // used are projected.
    val extrasUsed = scala.collection.mutable.LinkedHashMap[String, Alias]()
    def extra(name: String, typeOk: DataType => Boolean): Option[Attribute] =
      rollupAttrs.get(name).filter(a => typeOk(a.dataType)).map { a =>
        extrasUsed.getOrElseUpdate(name, Alias(a, s"__rollup_$name")()).toAttribute
      }

    // Whitelist pass, tied to the roll-up columns' ROLES — an aggregate
    // composes across levels only when it re-applies the function the
    // roll-up column was materialized with: max only over high (bucket
    // max-of-maxes IS the raw max), min only over low, min_by/max_by(·,
    // bare ts) only over open/close (the earliest raw row lives in the
    // earliest bucket, and any POINTWISE value expr commutes with "take
    // the first"), count(1) as sum(n_bars), count(c) as sum(n_<c>), and
    // decimal-cast sums as sums of the matching decimal roll-up column —
    // exact because decimal addition is associative. max(open), min(ts),
    // plain double sum(volume) etc. do NOT compose bit-exactly and veto.
    def bareThroughCasts(e: Expression, colName: String): Boolean = e match {
      case a: Attribute => a.name == colName
      case c: Cast => bareThroughCasts(c.child, colName)
      case _ => false
    }
    def refsOnly(e: Expression, colName: String): Boolean =
      e.references.forall(_.name == colName) && e.references.nonEmpty
    @scala.annotation.tailrec
    def stripCasts(e: Expression): Expression = e match {
      case c: Cast => stripCasts(c.child)
      case other => other
    }
    // ordering must be the bare ts attribute (casts only): a negated or
    // coarsened ordering (min_by(open, -ts), min_by(open, date_trunc(ts)))
    // references only ts but does NOT pick the same bucket across levels
    val byTs = (ord: Expression) => stripCasts(ord) match {
      case a: Attribute => a.exprId == tsAttr.exprId
      case _ => false
    }
    // a decimal-cast sum input resolves to the roll-up's exact-composition
    // column of the SAME decimal lattice (scale must match; the value sum
    // then composes exactly — one double rounding, at the top, if any)
    def decSumTarget(c: Expression): Option[Attribute] = c match {
      case cast: Cast => cast.dataType match {
        case dt: DecimalType => cast.child match {
          case a: Attribute =>
            extra(s"sum_${a.name}",
              { case d: DecimalType => d.scale == dt.scale; case _ => false })
          case m: Multiply => (m.left, m.right) match {
            case (x: Attribute, y: Attribute) if x.name == y.name =>
              extra(s"sum2_${x.name}",
                { case d: DecimalType => d.scale == dt.scale; case _ => false })
            case _ => None
          }
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }
    var ok = true
    val newAggExprs = agg.aggregateExpressions.map { ne =>
      ne.transform {
        case ae @ AggregateExpression(fn, _, isDistinct, filter, _) =>
          if (isDistinct || filter.nonEmpty) { ok = false; ae }
          else fn match {
            case Max(c) if bareThroughCasts(c, "high") => ae
            case Min(c) if bareThroughCasts(c, "low") => ae
            case MinBy(v, ord) if hasSymbolGroup && byTs(ord) &&
                refsOnly(v, "open") => ae
            case MaxBy(v, ord) if hasSymbolGroup && byTs(ord) &&
                refsOnly(v, "close") => ae
            case Count(Seq(Literal(1, _))) =>
              extra("n_bars", _ == LongType) match {
                case Some(nb) => ae.copy(aggregateFunction = Sum(nb))
                case None => ok = false; ae
              }
            case Count(Seq(a: Attribute)) =>
              extra(s"n_${a.name}", _ == LongType) match {
                case Some(n) => ae.copy(aggregateFunction = Sum(n))
                case None => ok = false; ae
              }
            case s: Sum =>
              decSumTarget(s.child) match {
                case Some(attr) =>
                  val nf = s.copy(child = attr)
                  if (nf.dataType == s.dataType)
                    ae.copy(aggregateFunction = nf)
                  else { ok = false; ae }
                case None => ok = false; ae
              }
            case _ => ok = false; ae
          }
      }.asInstanceOf[NamedExpression]
    }
    if (!ok) return None

    // level 1: roll-up columns take over the raw attributes' exprIds, so
    // the window alias and every aggregate expression re-resolve unchanged;
    // roll-up-only columns (n_bars, sum_*, …) ride along under fresh names
    val extraAliases = extrasUsed.values.toSeq
    val level1 = Project(
      needed.map(a => Alias(rollupAttrs(a.name), a.name)(exprId = a.exprId)) ++
        extraAliases,
      entry.rollup)
    val level2 = Project(
      Seq(windowAlias) ++ needed ++ extraAliases.map(_.toAttribute), level1)

    val out = Aggregate(agg.groupingExpressions, newAggExprs, level2)
    out.setTagValue(Rewritten, true)
    Some(out)
  }
}

/** Session-wide registry of materialized roll-ups, keyed by the raw
  * source's file paths — the cagg catalog. `register` validates the
  * bars+n_bars shape plus any recognized exact-composition columns;
  * `lookup` returns the FINEST roll-up whose step strictly divides the
  * query step (finest ⇒ buckets always compose, and strictness keeps a
  * roll-up's own defining query from matching itself).
  */
object RollupCatalog {

  final case class Entry(rawPaths: Set[String], stepUs: Long, rollup: LogicalPlan)

  @volatile private[plans] var entries: Seq[Entry] = Nil

  /** Declare `rollup` to be the `stepUs` OHLCV roll-up of the bars
    * pipeline scanning `raw`'s file source. The roll-up must expose
    * [[RollupRewrite.RollupCols]] (rename `bucket_ts` to `ts`); any
    * `sum_<c>` / `sum2_<c>` / `n_<c>` columns it also carries
    * ([[graft.operators.Resample.ohlcvRollup]] materializes them) are
    * registered too and let Sum/avg/stddev/count queries serve exactly.
    * Decimal/long shape of those columns is enforced here; that they hold
    * the true per-bucket values is the registration contract, same as for
    * open/high/low/close.
    */
  def register(raw: DataFrame, stepUs: Long, rollup: DataFrame): Unit = {
    val missing = RollupRewrite.RollupCols.filterNot(rollup.columns.contains)
    require(missing.isEmpty, s"roll-up is missing columns: ${missing.mkString(", ")}")
    require(stepUs > 0, "stepUs must be positive")
    val exactCols = RollupRewrite.exactColsIn(rollup.columns.toSeq)
    exactCols.foreach { c =>
      val dt = rollup.schema(c).dataType
      if (c.startsWith("n_"))
        require(dt == LongType, s"roll-up column $c must be BIGINT, got $dt")
      else
        require(dt.isInstanceOf[DecimalType],
          s"roll-up column $c must be DECIMAL (exactSumDec shape), got $dt")
    }
    val paths = raw.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
      case _ => Nil
    }.toSet
    require(paths.nonEmpty, "raw source has no file-based relation to key on")
    val pruned = rollup.select(
      (RollupRewrite.RollupCols ++ exactCols).map(rollup.col): _*)
    entries = entries :+ Entry(paths, stepUs, pruned.queryExecution.optimizedPlan)
  }

  def clear(): Unit = entries = Nil

  private[plans] def lookup(paths: Set[String], queryStepUs: Long): Option[Entry] =
    entries.filter(e => e.rawPaths == paths && e.stepUs < queryStepUs &&
        queryStepUs % e.stepUs == 0)
      .sortBy(_.stepUs).headOption
}
