package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming slice (SURVEY §2.8): the reference's only
  * incremental surface is a TimescaleDB continuous aggregate — a tumbling
  * 1-hour OHLCV roll-up refreshed with a 1-hour lag
  * (timescaledb_schema.sql:49-66) — plus upsert-on-replay dedup
  * (timeseries_db.py:415-427).
  *
  * Here that is: `readStream → withWatermark → dropDuplicatesWithinWatermark
  * → groupBy(window) → agg`, append mode. The watermark IS the refresh lag
  * (buckets finalize once the watermark passes their end); the
  * within-watermark dedup IS the `ON CONFLICT` replay guard, with state
  * bounded by the watermark horizon instead of an unbounded key set.
  *
  * Scale notes: state per key = one OHLCV accumulator per open
  * (symbol, bucket) window — bounded by watermark × symbol count, not by
  * stream length. `min_by/max_by` on ts make first/last well-defined under
  * arbitrary arrival order (same discipline as the batch A1 roll-up).
  * The same transform applied to a bounded DataFrame IS the batch A1 — one
  * code path for the lambda-architecture both-sides.
  */
object StreamRollup {

  /** Tumbling roll-up of a (possibly streaming) bar frame. Requires an
    * event-time `ts` TimestampType column.
    *
    * @param lateness   watermark delay — the continuous aggregate's
    *                   refresh-lag analog (reference: 1 hour)
    * @param dedupReplay drop same-(symbol, ts) retransmissions within the
    *                   watermark (the upsert conflict-target analog)
    */
  def ohlcvTumbling(bars: DataFrame, bucket: String = "1 hour",
      lateness: String = "1 hour", dedupReplay: Boolean = true,
      exactCols: Seq[String] = Seq("volume")): DataFrame = {
    import graft.functions.{exactSum, exactSumDec, exactSumSqDec}
    val marked = bars.withWatermark("ts", lateness)
    val deduped =
      if (dedupReplay) marked.dropDuplicatesWithinWatermark("symbol", "ts")
      else marked
    // volume via exactSum (deterministic, matches batch A1); per exactCol,
    // the decimal sum_* / sum2_* / n_* companions RollupRewrite serves
    // exactSum/exactAvg/exactVarSamp/count queries from — so a lake built
    // by this stream is registrable as a full continuous aggregate
    val extras = exactCols.flatMap(c => Seq(
      exactSumDec(col(c)).as(s"sum_$c"),
      exactSumSqDec(col(c)).as(s"sum2_$c"),
      count(col(c)).as(s"n_$c")))
    val aggs = Seq(
      min_by(col("open"), col("ts")).as("open"),
      max(col("high")).as("high"),
      min(col("low")).as("low"),
      max_by(col("close"), col("ts")).as("close"),
      exactSum(col("volume")).as("volume"),
      count(lit(1)).as("n_bars")) ++ extras
    deduped
      .groupBy(window(col("ts"), bucket).as("w"), col("symbol"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("w.start").as("bucket_ts") +: col("symbol") +:
        (Seq("open", "high", "low", "close", "volume", "n_bars") ++
          exactCols.flatMap(c => Seq(s"sum_$c", s"sum2_$c", s"n_$c"))).map(col): _*)
  }

  /** Land the rollup in a parquet lake: append mode + checkpoint gives
    * exactly-once bucket files (each finalized bucket written once, replay
    * resumes from the checkpoint offsets — the durable analog of the
    * reference's continuous-aggregate materialization).
    */
  def sinkToLake(rolled: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rolled.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** Land finalized buckets in a JDBC table via idempotent upserts per
    * micro-batch — the reference's TimescaleDB materialization path
    * (timeseries_db.py:399-434 `ON CONFLICT DO UPDATE`, streamed):
    * `foreachBatch` hands each finalized-bucket batch to
    * [[graft.sinks.JdbcUpsertSink]] keyed (symbol, bucket_ts), so
    * at-least-once micro-batch delivery (restarts, retries) still yields
    * exactly-once TABLE state — a replayed bucket overwrites itself.
    *
    * The `checkpoint` is MANDATORY for that claim to survive a restart:
    * without one, a restarted query loses its watermark + aggregation
    * state and can emit a PARTIALLY recomputed bucket (source resumed
    * mid-bucket) whose upsert silently overwrites a previously complete
    * row. With it, offsets + state resume exactly and a replayed
    * micro-batch re-upserts identical values (no-op on table state).
    */
  def sinkToJdbc(rolled: DataFrame, table: String, checkpoint: String,
      connect: () => java.sql.Connection)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rolled.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sinks.JdbcUpsertSink.write(batch, table,
          Seq("symbol", "bucket_ts"), graft.sinks.JdbcUpsertSink.DoUpdate,
          connect)
      }
      .outputMode("append")
      .start()
}
