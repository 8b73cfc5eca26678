package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Normalization transforms (SURVEY §2.7 N1-N3) — the reference's
  * `data_normalizer.py`. Fit is a single global aggregate reduced to a few
  * doubles and broadcast back (no second shuffle); transform/inverse are
  * pure row expressions, so the whole fit+transform plan is two scans of the
  * source and stays fully codegen'd at any scale.
  *
  * The fitted stats survive as columns (`__mu_c` etc.) until [[finish]]
  * drops them — callers that need the inverse keep them (the reference
  * caches scalers for `inverse_transform`, data_normalizer.py:43-59).
  */
object Normalize {

  /** N1 — z-score: (x − μ)/σ, sample σ (pandas `std`, ddof=1). */
  def zscoreFit(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(exactAvg(col(c)).as(s"__mu_$c"), exactStdSamp(col(c)).as(s"__sd_$c")))
    df.crossJoin(broadcast(df.agg(aggs.head, aggs.tail: _*)))
  }

  // try_divide in the transforms: a constant column (σ=0 or max=min) yields
  // NULL instead of an ANSI DIVIDE_BY_ZERO job failure — matching DuckDB
  // float-division semantics; identical doubles whenever the divisor is ≠0.
  def zscoreTransform(fitted: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(fitted)((d, c) =>
      d.withColumn(c, try_divide(col(c) - col(s"__mu_$c"), col(s"__sd_$c"))))

  def zscoreInverse(fitted: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(fitted)((d, c) =>
      d.withColumn(c, col(c) * col(s"__sd_$c") + col(s"__mu_$c")))

  /** N2 — min-max: (x − min)/(max − min). */
  def minmaxFit(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c")))
    df.crossJoin(broadcast(df.agg(aggs.head, aggs.tail: _*)))
  }

  def minmaxTransform(fitted: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(fitted)((d, c) =>
      d.withColumn(c, try_divide(col(c) - col(s"__mn_$c"), col(s"__mx_$c") - col(s"__mn_$c"))))

  def minmaxInverse(fitted: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(fitted)((d, c) =>
      d.withColumn(c, col(c) * (col(s"__mx_$c") - col(s"__mn_$c")) + col(s"__mn_$c")))

  /** N3 — log normalize: ln(1+x); inverse exp(x)−1 (data_normalizer.py:60-63).
    * Deliberately `ln(1+x)` via [[graft.functions.JavaLog]] rather than
    * builtin `log1p`: DuckDB has no log1p, and Spark's builtin log uses
    * StrictMath which differs from libm by 1 ulp on some inputs, breaking
    * the bit-exact oracle hash. The ≤1 ulp difference is irrelevant for
    * normalization semantics.
    */
  def logTransform(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, JavaMath.jlog(lit(1.0) + col(c))))

  def logInverse(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, exp(col(c)) - lit(1.0)))

  /** Drop fitted-stat columns once the inverse is no longer needed. */
  def finish(df: DataFrame): DataFrame =
    df.drop(df.columns.filter(_.startsWith("__")): _*)
}
