package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the validation gate a
  * training-data pipeline runs before it trusts a corpus (the engine-side
  * generalization of the reference's ad-hoc quality checks in
  * data_cleaner.py / pipeline_status_report.py: null scans, negative
  * volume, OHLC invariants, coverage thresholds).
  *
  * Scale design: the whole suite compiles to ONE aggregate over ONE scan
  * of the dataset — N constraints cost one pass at 100 TB, not N passes.
  * Row-level rules become `sum(CASE WHEN violated)` columns of a single
  * Aggregate; unique-key checks ride the same scan (Spark plans
  * multi-distinct via Expand — more rows through the aggregate, still one
  * file scan); the per-constraint verdict rows are exploded from the one
  * aggregate row in-plan, so the result is itself a DataFrame composable
  * into larger jobs. DataQualitySpec pins the single-scan plan shape.
  * Referential integrity is the one constraint that genuinely needs a
  * second input, so it is a separate (anti-join) job returning the same
  * verdict schema for unioning.
  *
  * Verdict frame schema: (rule, target, value, threshold, pass) —
  * `value` is the measured metric (violation count, ratio, or row count),
  * `pass` the boolean verdict, deterministic for oracle replay.
  */
object DataQuality {

  sealed trait Check
  /** No NULLs in `column`. */
  final case class NotNull(column: String) extends Check
  /** Fraction of non-null `column` values >= minRatio. */
  final case class Completeness(column: String, minRatio: Double) extends Check
  /** No negative values (NULLs don't count as violations). */
  final case class NonNegative(column: String) extends Check
  /** All non-null values within [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Check
  /** Named row predicate that must hold; NULL predicate = not a violation
    * (match SQL's WHERE-style three-valued logic; make the rule itself
    * null-strict if NULLs should fail).
    */
  final case class RowRule(name: String, predicate: Column) extends Check
  /** No duplicate (fully non-null) key tuples. */
  final case class UniqueKey(columns: Seq[String]) extends Check
  /** At least n rows. */
  final case class MinRows(n: Long) extends Check
  /** All non-null values fully match the regex. */
  final case class MatchesRegex(column: String, pattern: String) extends Check

  private def violations(cond: Column): Column =
    sum(when(coalesce(cond, lit(false)), 1L).otherwise(0L))

  private def verdict(rule: String, target: String, value: Column,
      threshold: Double, pass: Column): Column =
    struct(lit(rule).as("rule"), lit(target).as("target"),
      value.cast("double").as("value"), lit(threshold).as("threshold"),
      pass.as("pass"))

  /** Evaluate every check in one aggregate pass; one verdict row each. */
  def verify(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val n = count(lit(1))
    val verdicts: Seq[Column] = checks.map {
      case NotNull(c) =>
        val v = violations(col(c).isNull)
        verdict("not_null", c, v, 0.0, v === 0)
      case Completeness(c, r) =>
        val ratio = count(col(c)).cast("double") / n.cast("double")
        verdict("completeness", c, ratio, r, ratio >= r)
      case NonNegative(c) =>
        val v = violations(col(c) < 0)
        verdict("non_negative", c, v, 0.0, v === 0)
      case InRange(c, lo, hi) =>
        val v = violations(col(c) < lo || col(c) > hi)
        verdict("in_range", c, v, 0.0, v === 0)
      case RowRule(name, p) =>
        val v = violations(!p)
        verdict("row_rule", name, v, 0.0, v === 0)
      case UniqueKey(cols) =>
        // dup count over fully non-null tuples (countDistinct skips any-
        // null tuples, so the minuend must too)
        val nonNull = cols.map(col(_).isNotNull).reduce(_ && _)
        val tuples = sum(when(nonNull, 1L).otherwise(0L))
        val v = tuples - countDistinct(col(cols.head), cols.tail.map(col): _*)
        verdict("unique_key", cols.mkString(","), v, 0.0, v === 0)
      case MinRows(m) =>
        verdict("min_rows", "*", n, m.toDouble, n >= m)
      case MatchesRegex(c, p) =>
        val v = violations(col(c).isNotNull && !col(c).rlike(p))
        verdict("matches_regex", c, v, 0.0, v === 0)
    }
    df.agg(verdicts.head.as("v0"),
        verdicts.tail.zipWithIndex.map { case (c, i) => c.as(s"v${i + 1}") }: _*)
      .select(explode(array(verdicts.indices.map(i => col(s"v$i")): _*))
        .as("verdict"))
      .select("verdict.*")
  }

  /** TRUE iff the row violates the (row-local) check. Dataset-level
    * checks (completeness/unique-key/min-rows) have no per-row meaning
    * and are refused loudly.
    */
  private def rowViolation(check: Check): (String, Column) = check match {
    case NotNull(c) => (s"not_null:$c", col(c).isNull)
    case NonNegative(c) => (s"non_negative:$c", coalesce(col(c) < 0, lit(false)))
    case InRange(c, lo, hi) =>
      (s"in_range:$c", coalesce(col(c) < lo || col(c) > hi, lit(false)))
    case RowRule(name, p) => (s"row_rule:$name", coalesce(!p, lit(false)))
    case MatchesRegex(c, p) =>
      (s"matches_regex:$c", col(c).isNotNull && !col(c).rlike(p))
    case other => throw new IllegalArgumentException(
      s"$other is dataset-level — it has no per-row verdict; use verify()")
  }

  /** One-projection row router: annotate every row with the names of the
    * row-local rules it violates (`outCol`, empty array = clean). No
    * extra scan, no shuffle, no job — compose
    * `.filter(size(col(outCol)) === 0)` for the clean feed and its
    * complement for the quarantine sink, and both sides share the single
    * pass. The operational half of the DQ gate: verify() decides WHETHER
    * the batch is usable, quarantine() routes WHICH rows poisoned it.
    */
  def quarantine(df: DataFrame, checks: Seq[Check],
      outCol: String = "_violations"): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val tagged = checks.map(rowViolation).map { case (tag, cond) =>
      when(cond, lit(tag)).otherwise(lit(null))
    }
    df.withColumn(outCol,
      filter(array(tagged: _*), x => x.isNotNull))
  }

  /** The suite as zero-cost observed metrics: every row-local check (and
    * row count) rides the frame's OWN pass as an `observe` aggregate — no
    * second scan, and on a STREAM the violation counts surface per
    * micro-batch in `StreamingQueryProgress.observedMetrics(name)`. This
    * is how a 100 TB ingest watches its own quality without paying for a
    * validation job: the metrics are free bytes on the pipeline it was
    * already running.
    */
  def observed(df: DataFrame, checks: Seq[Check],
      name: String = "dq"): DataFrame = {
    val aggs = count(lit(1)).as("rows") +:
      checks.map(rowViolation).map { case (tag, cond) =>
        sum(when(cond, 1L).otherwise(0L)).as(tag)
      }
    df.observe(name, aggs.head, aggs.tail: _*)
  }

  /** Referential integrity: every non-null `factCol` value exists in
    * `dim.dimCol`; `value` = number of DISTINCT orphan keys. Anti-join on
    * the DISTINCT fact keys — the shuffled side is the key set, not the
    * fact table, and Catalyst/AQE broadcast the dim when it fits. Same
    * verdict schema as [[verify]] for unioning.
    */
  def referentialIntegrity(fact: DataFrame, factCol: String,
      dim: DataFrame, dimCol: String): DataFrame = {
    val orphan = fact.select(col(factCol)).filter(col(factCol).isNotNull)
      .distinct()
      .join(dim.select(col(dimCol)).distinct(),
        col(factCol) === col(dimCol), "left_anti")
      .agg(count(lit(1)).as("orphans"))
    orphan.select(
      lit("referential_integrity").as("rule"),
      lit(s"$factCol->$dimCol").as("target"),
      col("orphans").cast("double").as("value"),
      lit(0.0).as("threshold"),
      (col("orphans") === 0).as("pass"))
  }
}
