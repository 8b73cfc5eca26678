package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.Sessionize

/** Streaming gap-sessionization — the incremental twin of
  * [[graft.operators.Sessionize.sessionize]], via the SAME transform:
  * watermark + `session_window` groupBy in append mode. A session row is
  * emitted exactly once, when the watermark passes its close (last event
  * + gap); a quiet user's open session stays in state until then.
  *
  * State per key = one open session accumulator per user active within
  * the watermark horizon — bounded by (active users × lateness), not by
  * stream length; Spark merges sessions whose windows touch across
  * micro-batches, so out-of-order arrival within the watermark lands in
  * the right session (asserted in StreamingSpec, including a late event
  * that BRIDGES two provisional sessions into one).
  *
  * Batch-identical by construction: applying this to a bounded frame IS
  * the batch `sessionize` (one shared code path — the lambda-architecture
  * discipline used throughout [[StreamRollup]]).
  */
object StreamSessions {

  /** Per-(user, session) rollup of a streaming event frame. Requires an
    * event-time `ts` timestamp column; emits on session close.
    *
    * @param lateness watermark delay: how long to wait for stragglers
    *                 before a session can finalize. Also the replay
    *                 horizon for upstream dedup if composed with
    *                 `dropDuplicatesWithinWatermark`.
    */
  def sessions(events: DataFrame, gapSeconds: Long,
      lateness: String = "1 hour"): DataFrame =
    Sessionize.sessionize(events.withWatermark("ts", lateness),
      col("user_id"), col("ts"), col("value"), gapSeconds)
}
