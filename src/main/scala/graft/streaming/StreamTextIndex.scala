package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextIndex

/** Streaming ingestion into the persisted inverted index
  * ([[graft.operators.TextIndex]]): each micro-batch of NEW documents is
  * appended as query-ready posting partitions — the text-search
  * counterpart of [[graft.operators.VectorIndex]]'s `appendStream`.
  *
  * Per micro-batch work is exactly [[TextIndex.append]]: one tokenize
  * pass over the batch, posting rows stage and commit into their
  * term-hash bucket partitions (no existing file read or rewritten), and
  * the stats delta is APPENDED to the stats log. A query issued after
  * batch N commits sees every document of batches 1..N with scores
  * bit-identical to a cold rebuild (TextIndexSpec property, asserted
  * again under streaming in StreamingSpec).
  *
  * Delivery: `foreachBatch` replays the in-flight batch after a crash,
  * and the epoch id is passed as [[TextIndex.append]]'s idempotency key
  * — a replayed batch whose commit already landed is a no-op, and one
  * that crashed mid-commit rolls forward/back via the staging marker, so
  * index COMMITS are exactly-once (round 6 double-appended tf on
  * replay). Duplicate DOCUMENTS across different batches remain
  * upstream's job ([[StreamDocs.cleanStream]]'s within-watermark dedup,
  * or [[graft.operators.Dedup.incrementalDropList]] at admission).
  * Micro-batches arrive serially per query — the single-writer contract
  * holds by construction.
  */
object StreamTextIndex {

  def appendStream(docs: DataFrame, text: Column, id: Column, path: String,
      checkpoint: String, buckets: Int = 64): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty)
          TextIndex.append(batch.sparkSession, batch, text, id, path,
            batchId = s"epoch-$epochId", buckets = buckets)
      }
      .outputMode("append")
      .start()
}
