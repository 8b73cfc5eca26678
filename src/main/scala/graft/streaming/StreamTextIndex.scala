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
  * pass over the batch, posting rows land append-mode in their term-hash
  * bucket partitions (no existing file read or rewritten), and the
  * two-long stats row is summed forward. A query issued after batch N
  * commits sees every document of batches 1..N with scores bit-identical
  * to a cold rebuild (TextIndexSpec property, asserted again under
  * streaming in StreamingSpec).
  *
  * Delivery: standard `foreachBatch` at-least-once. A REPLAYED batch
  * would double-append postings (tf doubles); exactly-once ingestion
  * pairs this with upstream replay dedup ([[StreamDocs.cleanStream]]'s
  * within-watermark dedup, or [[graft.operators.Dedup
  * .incrementalDropList]] at admission) — same contract as the JDBC
  * rollup sink, stated rather than hidden.
  */
object StreamTextIndex {

  def appendStream(docs: DataFrame, text: Column, id: Column, path: String,
      checkpoint: String, buckets: Int = 64): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          TextIndex.append(batch.sparkSession, batch, text, id, path, buckets)
      }
      .outputMode("append")
      .start()
}
