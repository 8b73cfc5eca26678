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
      lateness: String = "1 hour", dedupReplay: Boolean = true): DataFrame = {
    val marked = bars.withWatermark("ts", lateness)
    val deduped =
      if (dedupReplay) marked.dropDuplicatesWithinWatermark("symbol", "ts")
      else marked
    deduped
      .groupBy(window(col("ts"), bucket).as("w"), col("symbol"))
      .agg(
        min_by(col("open"), col("ts")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("ts")).as("close"),
        sum(col("volume")).as("volume"),
        count(lit(1)).as("n_bars"))
      .select(col("w.start").as("bucket_ts"), col("symbol"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("n_bars"))
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
    */
  def sinkToJdbc(rolled: DataFrame, table: String,
      connect: () => java.sql.Connection)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rolled.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sinks.JdbcUpsertSink.write(batch, table,
          Seq("symbol", "bucket_ts"), graft.sinks.JdbcUpsertSink.DoUpdate,
          connect)
      }
      .outputMode("append")
      .start()
}
