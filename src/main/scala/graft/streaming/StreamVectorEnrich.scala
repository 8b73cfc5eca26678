package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.VectorIndex

/** Streaming ANN enrichment — the serving counterpart of the persisted
  * [[graft.operators.VectorIndex]]: a firehose of embedding-bearing
  * records (new documents, fresh user queries) gets its top-k neighbors
  * from the indexed corpus, micro-batch by micro-batch.
  *
  * Shape: `foreachBatch` hands each micro-batch of queries to the SAME
  * partition-pruned ADC + exact-refine lookup the batch path uses
  * ([[VectorIndex.topK]]) — so the streaming results are definitionally
  * the batch results for that query set (asserted in StreamingSpec), and
  * every scale property carries over: the probed lists become partition
  * filters, ranking is the bounded-heap aggregate, the refine touches
  * `batch × shortlist` raw vectors. Per-batch driver work is the probed
  * cent_id collect — `batchRows × nProbe` ids.
  *
  * Delivery is the standard `foreachBatch` contract (same as
  * [[StreamRollup.sinkToJdbc]]): at-least-once batch invocation under the
  * checkpoint; pair with an idempotent sink (keyed upsert on
  * `(query_id, rank)`, or an overwrite-by-batch lake partition) for
  * exactly-once TABLE state.
  */
object StreamVectorEnrich {

  /** Start the enrichment: for each micro-batch of `queries`
    * (`vec_id`, `embedding`, …), compute top-k neighbors against the
    * indexed `corpus` and hand `(query_id, rank, neighbor_id, cosine)`
    * rows to `sink`.
    */
  def enrich(queries: DataFrame, corpus: DataFrame, idx: VectorIndex.Index,
      k: Int, checkpoint: String, nProbe: Int = 4, shortlist: Int = 100)
      (sink: DataFrame => Unit): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          sink(VectorIndex.topK(batch, corpus, idx, k, nProbe, shortlist))
      }
      .outputMode("append")
      .start()
}
