package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus pipeline, composed from the engine's own
  * operators — the flagship proof that the pieces snap together into the
  * hygiene chain a real pre-training run executes:
  *
  *   1. quality gate        — [[TextOps.filterVerdict]] == "keep"
  *   2. exact dedup         — keep the lowest doc_id per content digest
  *   3. decontamination     — drop docs whose word-n-gram overlap with the
  *                            benchmark residue class crosses a ratio
  *                            ([[Contamination.overlapReport]])
  *   4. shard assignment    — per-source token-budget packing
  *                            ([[Split.packByTokenBudget]])
  *
  * Scale shape, stage by stage (nothing here is new machinery — each stage
  * inherits the scale argument of the operator it delegates to):
  *   - the quality gate is a map-only filter;
  *   - dedup is ONE exchange keyed by the 256-bit digest (row_number over
  *     the digest partition, not groupBy + join-back);
  *   - decontamination broadcasts the benchmark grams and anti-joins the
  *     (small, broadcastable) flagged-id list;
  *   - packing is the per-source prefix window —
  *     [[Split.packByTokenBudgetChunked]] is the drop-in for a 90%-hot
  *     source.
  * The corpus itself is scanned once and shuffled twice (digest, source) —
  * there is no stage quadratic in corpus size or duplication.
  */
object CorpusPipeline {

  /** Returns surviving docs labeled (doc_id, source, n_tokens, bin_id,
    * bin_offset). `benchResidue` carves the benchmark class out of the
    * corpus by id residue (its docs are excluded from training AND define
    * the contamination set, the usual held-out-eval discipline).
    */
  def run(docs: DataFrame, text: Column, id: Column,
      benchResidue: Int = 97, n: Int = 3,
      contaminationThreshold: Double = 0.05,
      budget: Long = 256L): DataFrame = {
    require(benchResidue > 1, s"benchResidue must be > 1, got $benchResidue")
    require(contaminationThreshold > 0.0,
      s"threshold must be positive, got $contaminationThreshold")
    val train = docs.filter(id % benchResidue =!= 0)
    val kept = train.filter(TextOps.filterVerdict(text) === "keep")
    val deduped = kept
      .withColumn("__rn", row_number().over(
        Window.partitionBy(sha2(text, 256)).orderBy(id)))
      .filter(col("__rn") === 1).drop("__rn")
    val bench = Contamination.benchmarkGrams(
      docs.filter(id % benchResidue === 0), text, n)
    val flagged = Contamination.overlapReport(deduped, text, id, bench, n)
      .filter(col("overlap_ratio") >= contaminationThreshold)
      .select(col("doc_id"))
    val clean = deduped.join(broadcast(flagged.withColumnRenamed("doc_id", "__flag_id")),
      id === col("__flag_id"), "left_anti")
    Split.packByTokenBudget(
      clean.select(col("doc_id"), col("source"),
        TextOps.tokenCount(text).as("n_tokens")),
      Seq(col("source")), Seq(col("doc_id")), col("n_tokens"), budget)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("bin_id"), col("bin_offset"))
  }
}
