package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}

/** Streaming document ingestion — the LLM-training-data pipeline's
  * incremental surface: `readStream → text metrics → quality filter →
  * exact dedup within watermark → sink`. The batch operators (TextOps,
  * Dedup's content digest) ARE the stream transforms; only dedup state
  * changes meaning (bounded by the watermark horizon instead of a
  * corpus-wide digest set).
  *
  * Scale notes:
  *   - every metric is a map-only Column expression — the streaming plan
  *     adds NO state for scoring/filtering;
  *   - dedup state = one entry per distinct content digest inside the
  *     watermark window. At 100 TB/day ingest that is bounded by
  *     (docs/day × horizon), not corpus size — the full-corpus dedup
  *     remains the batch [[graft.operators.Dedup]] job over the landed
  *     lake (streaming dedup stops same-burst duplicates, the batch pass
  *     stops long-range ones; this split is the standard production
  *     design).
  */
object StreamDocs {

  /** Score + filter + dedup a (possibly streaming) document frame with an
    * event-time `ts` column. Survivors carry their FUZZY-dedup
    * signatures too (mh00..mh15 + simhash via [[Dedup.withSignatures]],
    * bit-equal to the batch forms): the landed lake is immediately
    * drop-list-extendable — a batch [[Dedup.dropListAtScale]] pass over
    * new rows bands the PERSISTED signatures without re-tokenizing the
    * corpus. Signatures are computed AFTER the quality filter and dedup
    * (no tokens burned on rows that won't land) and are map-only, so the
    * streaming plan gains no state.
    *
    * @param minQuality  drop documents scoring below this
    *                    ([[TextOps.qualityScore]]'s 0-1 scale)
    * @param lateness    watermark delay bounding dedup state
    */
  def cleanStream(docs: DataFrame, minQuality: Double = 0.3,
      lateness: String = "1 hour"): DataFrame =
    Dedup.withSignatures(
      docs
        .withColumn("quality", TextOps.qualityScore(col("text")))
        .withColumn("lang", TextOps.langId(col("text")))
        .withColumn("n_tokens", TextOps.tokenCount(col("text")))
        // Gopher-style rule verdict + PII-scrubbed text land WITH the
        // row (map-only, stateless): the lake keeps the raw text for
        // re-filtering, the verdict explains the quality score, and the
        // scrubbed column is what a training export reads. Bit-equal to
        // the batch x7/x8 forms (StreamingSpec asserts).
        .withColumn("verdict", TextOps.filterVerdict(col("text")))
        .withColumn("scrubbed", TextOps.scrubPii(col("text")))
        .withColumn("content_hash", sha2(col("text"), 256))
        .filter(col("quality") >= minQuality)
        .withWatermark("ts", lateness)
        .dropDuplicatesWithinWatermark("content_hash"),
      col("text"))
}
