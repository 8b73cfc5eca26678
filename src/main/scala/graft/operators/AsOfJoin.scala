package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.epochUs

/** Backward as-of join: for each left row, attach the most recent right row
  * with `right.ts <= left.ts` within the same key group (SURVEY §2.6 — the
  * reference approximates this by resampling both series to a shared grid;
  * here it's a first-class operator, e.g. trade→latest-quote alignment).
  *
  * Implementation is the scalable union-ffill pattern, NOT a range join:
  * tag both sides, union, and forward-fill the right-side payload over one
  * (key, ts)-sorted window. Cost = one shuffle on the key + one sort —
  * no |L|×|R| blow-up, no broadcast requirement on either side; skewed keys
  * are AQE's problem, same as any window op. A right row at exactly left.ts
  * wins (`<=`: right sorts before left on the side tiebreak), matching
  * pandas `merge_asof` and DuckDB `ASOF JOIN`.
  */
object AsOfJoin {

  /** @param left      left ("probe") rows
    * @param right     right ("reference") rows
    * @param on        equi-key columns present in both sides
    * @param ts        time column name present in both sides
    * @param rightCols right payload columns to attach as `right_<name>`
    *                  (null when no match)
    * @param toleranceUs max allowed left.ts − right.ts in microseconds;
    *                  None = unbounded lookback
    */
  def asof(left: DataFrame, right: DataFrame, on: Seq[String], ts: String,
      rightCols: Seq[String], toleranceUs: Option[Long] = None): DataFrame =
    directional(left, right, on, ts, rightCols, toleranceUs, backward = true)

  /** Forward as-of: earliest right row with `right.ts >= left.ts` (pandas
    * merge_asof direction="forward"). Same union pattern with the fill
    * running over descending time.
    */
  def asofForward(left: DataFrame, right: DataFrame, on: Seq[String], ts: String,
      rightCols: Seq[String], toleranceUs: Option[Long] = None): DataFrame =
    directional(left, right, on, ts, rightCols, toleranceUs, backward = false)

  /** Nearest as-of (pandas direction="nearest"): closest right row in
    * either direction, ties to the earlier one — composed from both
    * directional passes (two window sorts, still no pair blow-up).
    */
  def asofNearest(left: DataFrame, right: DataFrame, on: Seq[String], ts: String,
      rightCols: Seq[String], toleranceUs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // backward pass; stash its match (incl. matched ts) on the row, then run
    // the forward pass with those columns riding along as plain left columns
    val b = directionalWithTs(left, right, on, ts, rightCols, toleranceUs,
      backward = true)
      .withColumnRenamed("__match_ts", "__b_ts")
    val b2 = rightCols.foldLeft(b)((d, c) =>
      d.withColumnRenamed(s"right_$c", s"__b_$c"))
    val f = directionalWithTs(b2, right, on, ts, rightCols, toleranceUs,
      backward = false)
      .withColumnRenamed("__match_ts", "__f_ts")
    val bDist = epochUs(col(ts)) - epochUs(col("__b_ts"))
    val fDist = epochUs(col("__f_ts")) - epochUs(col(ts))
    // nearest, ties to the earlier (backward) match — pandas semantics
    val pickBackward = col("__b_ts").isNotNull &&
      (col("__f_ts").isNull || bDist <= fDist)
    val picked = rightCols.foldLeft(f)((d, c) =>
      d.withColumn(s"right_$c",
        when(pickBackward, col(s"__b_$c")).otherwise(col(s"right_$c"))))
    picked.select(
      leftCols.map(col) ++ rightCols.map(c => col(s"right_$c")): _*)
  }

  private def directional(left: DataFrame, right: DataFrame, on: Seq[String],
      ts: String, rightCols: Seq[String], toleranceUs: Option[Long],
      backward: Boolean): DataFrame = {
    val out = directionalWithTs(left, right, on, ts, rightCols, toleranceUs, backward)
    out.drop("__match_ts")
  }

  /** Directional core; also emits `__match_ts` (the matched right row's
    * timestamp) so callers (nearest) can compare distances.
    */
  private[operators] def directionalWithTs(left: DataFrame, right: DataFrame,
      on: Seq[String], ts: String, rightCols: Seq[String],
      toleranceUs: Option[Long], backward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val rPayload = ts +: rightCols
    // side tiebreak: backward wants right-before-left at equal ts (right
    // sorts first ascending); forward wants right-after-left at equal ts
    // (right sorts first descending) — 0/1 works for both orders.
    val l = left.select(
      on.map(col) :+ col(ts) :+ lit(1).as("__side") :+
        struct(leftCols.map(col): _*).as("__l") :+
        lit(null).cast(right.select(rPayload.map(col): _*).schema).as("__r"): _*)
    val r = right.select(
      on.map(col) :+ col(ts) :+ lit(0).as("__side") :+
        lit(null).cast(left.schema).as("__l") :+
        struct(rPayload.map(col): _*).as("__r"): _*)
    val ord =
      if (backward) Seq(col(ts).asc, col("__side").asc)
      else Seq(col(ts).desc, col("__side").asc)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val dist =
      if (backward) epochUs(col(ts)) - epochUs(col(s"__m.$ts"))
      else epochUs(col(s"__m.$ts")) - epochUs(col(ts))
    val withTol = toleranceUs match {
      case Some(us) => matched.withColumn("__m",
        when(col("__m").isNotNull && dist <= us, col("__m")))
      case None => matched
    }
    withTol.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        (col(s"__m.$ts").as("__match_ts") +:
          rightCols.map(c => col(s"__m.$c").as(s"right_$c"))): _*)
  }
}
