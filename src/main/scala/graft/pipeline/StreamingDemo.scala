package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Cleaning, Profile}
import graft.sinks.SnapshotLake
import graft.streaming.StreamRollup

/** The reference lifecycle (SURVEY §3.1: extract → clean → aggregate →
  * store → report) as ONE continuous Structured Streaming pipeline — the
  * README quick-start, every stage an existing engine piece:
  *
  *   raw kline stream
  *     → row-local clean (non-negative volume, OHLC repair — the
  *       streaming-safe slice of the F/O chain; replay dedup happens
  *       within the rollup's watermark)
  *     → tumbling OHLCV rollup ([[StreamRollup.ohlcvTumbling]] — the
  *       TimescaleDB continuous aggregate, watermark = refresh lag)
  *     → ONE foreachBatch sink that
  *        (a) lands finalized buckets in a snapshot lake exactly-once
  *            ([[SnapshotLake.appendStream]] batch-id dedup), and
  *        (b) maintains the incremental ANALYZE profile of everything
  *            ingested ([[Profile.profileStream]] — census partials,
  *            HLL registers, bottom-k sample), so the "report" stage
  *            is a metadata-read, never a rescan.
  *
  * Exactly-once across restarts: the checkpoint replays the last
  * micro-batch after a crash; the lake append skips replayed batch ids
  * whole, the census partial rides the same discipline, and the
  * HLL/sample states are naturally idempotent — so lake contents AND
  * the assembled profile equal the one-shot batch computation
  * bit-for-bit (StreamingSpec pins this across a stop/restart).
  *
  * At 100 TB/day this is the shape that holds: per-batch work is
  * ∝ batch size (rollup state bounded by watermark × symbols, profile
  * states are fixed-size sketches), the lake grows by appended files
  * only, and readers pin manifest versions — no stage rereads history.
  */
object StreamingDemo {

  /** The streaming-safe slice of the cleaning chain (the F/O steps that
    * are row-local): volume must be non-negative, OHLC envelopes are
    * repaired (high := max(o,h,l,c), low := min) rather than dropped,
    * null timestamps go. Stateful steps stay where they belong:
    * duplicate retransmissions collapse inside the rollup's
    * watermarked dedup, and distributional checks (IQR, z-score) run
    * on the maintained profile, not in the hot path.
    */
  def cleanStream(raw: DataFrame): DataFrame =
    Cleaning.repairOhlc(
      Cleaning.filterNonNegative(raw.filter(col("ts").isNotNull),
        Seq("volume", "open", "high", "low", "close")))

  /** Wire the full lifecycle onto a (streaming) raw bar frame with
    * columns (symbol, ts, open, high, low, close, volume). Returns the
    * started query; the caller owns checkpoint/lake/profile roots.
    */
  def start(rawBars: DataFrame, lakeRoot: String, profileRoot: String,
      checkpoint: String, bucket: String = "1 hour",
      lateness: String = "1 hour",
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val rolled = StreamRollup.ohlcvTumbling(cleanStream(rawBars),
      bucket, lateness)
    val landLake = SnapshotLake.appendStream(lakeRoot,
      statsCols = Seq("bucket_ts"))
    val keepProfile = Profile.profileStream(profileRoot, keyCol = "__pk",
      cols = Seq("symbol", "open", "high", "low", "close", "volume",
        "n_bars"))
    rolled.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // one materialization serves both effects
        val b = batch.persist()
        try {
          landLake(b, id)
          // profile key: (symbol, bucket) is the rollup's unique grain
          keepProfile(b.withColumn("__pk",
            concat_ws("|", col("symbol"), col("bucket_ts").cast("string"))), id)
        } finally b.unpersist()
        ()
      }
      .start()
  }

  /** The "report" stage: the maintained ANALYZE profile of everything
    * the pipeline ever ingested — a metadata read of the three profile
    * states, identical to one-shot [[Profile.dataset]] over the lake.
    */
  def report(spark: SparkSession, profileRoot: String): DataFrame =
    Profile.assemble(spark, profileRoot)
}
