package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{epochUs, exactSum}

/** Event sessionization — gap-based session assignment over an event
  * stream, the standard building block for behavioral / clickstream
  * training data (and the batch twin of Structured Streaming's
  * `session_window`).
  *
  * Reference scope: the reference's event handling stops at range-bucketed
  * "sessions" (fixed tumbling buckets; see `rj1_range_join`). True
  * gap-based sessions — a new session starts when a user is quiet for
  * longer than `gap` — are beyond-reference surface, first-class here
  * because every training pipeline over interaction logs needs them.
  *
  * Two implementations, deliberately:
  *
  *  - [[sessionize]] — `groupBy(user, session_window(ts, gap))`, the
  *    Spark-native path. ONE exchange on the user key; session merging
  *    runs inside the aggregate (`MergingSessionsExec` ballpark — sort
  *    within partition, no per-user total-order window pass, no
  *    WindowExec). This is the 100 TB path: AQE can split skewed
  *    partitions between the exchange and the merge, and nothing ever
  *    materializes a per-user global ordering.
  *    Boundary semantics (probed, pinned by SessionizeSpec): events
  *    exactly `gap` apart MERGE — a new session starts only when
  *    `ts - prev > gap`.
  *
  *  - [[withSessionIndex]] — the gaps-and-islands window form (`lag` +
  *    running sum over a per-user window), which additionally yields the
  *    per-user session ORDINAL (1st, 2nd, … session) that the
  *    session_window form cannot express. Costs a per-user sort window;
  *    a pathologically hot user serializes its partition — the
  *    lag/cumsum pair is exactly the [[Skew.chunkedSeries]] shape
  *    (halo 1) if that ever bites. Use [[sessionize]] unless the ordinal
  *    is genuinely needed.
  *
  * Both forms are asserted equal on shared boundaries in SessionizeSpec;
  * [[sessionize]] is the oracle-gated one (`se1_sessionize`).
  */
object Sessionize {

  /** Per-session rollup via `session_window`: one row per (user, session)
    * with µs start/end (min/max event time — NOT the window struct's
    * `end`, which is `max + gap` and would leak the gap parameter into
    * the output), event count, and exact-decimal value sum.
    */
  def sessionize(df: DataFrame, user: Column, ts: Column, value: Column,
      gapSeconds: Long): DataFrame =
    df.groupBy(user.as("user_id"), session_window(ts, s"$gapSeconds seconds"))
      .agg(
        min(epochUs(ts)).as("session_start_us"),
        max(epochUs(ts)).as("session_end_us"),
        count(lit(1)).as("n_events"),
        exactSum(value).as("sum_value"))
      .drop("session_window")

  /** Row-preserving session ordinals: adds `session_idx` (1-based, in
    * time order per user). `tieBreak` makes the ordering total when
    * timestamps collide (ids within one session are unaffected by tie
    * order — equal timestamps always share a session — but the lag pass
    * itself must be deterministic).
    */
  def withSessionIndex(df: DataFrame, user: Column, ts: Column,
      tieBreak: Column, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(user).orderBy(ts, tieBreak)
    val prev = lag(epochUs(ts), 1).over(w)
    val newSession =
      when(prev.isNull || epochUs(ts) - prev > gapSeconds * 1000000L, 1L)
        .otherwise(0L)
    df.withColumn("session_idx",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }
}
