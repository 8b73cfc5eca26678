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
      rightCols: Seq[String], toleranceUs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val rPayload = ts +: rightCols
    val l = left.select(
      on.map(col) :+ col(ts) :+ lit(1).as("__side") :+
        struct(leftCols.map(col): _*).as("__l") :+
        lit(null).cast(right.select(rPayload.map(col): _*).schema).as("__r"): _*)
    val r = right.select(
      on.map(col) :+ col(ts) :+ lit(0).as("__side") :+
        lit(null).cast(left.schema).as("__l") :+
        struct(rPayload.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val withTol = toleranceUs match {
      case Some(us) => matched.withColumn("__m",
        when(col("__m").isNotNull &&
          epochUs(col(ts)) - epochUs(col(s"__m.$ts")) <= us, col("__m")))
      case None => matched
    }
    withTol.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__m.$c").as(s"right_$c")): _*)
  }
}
