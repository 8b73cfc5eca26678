package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextNative

/** Benchmark decontamination: flag training documents whose word n-grams
  * overlap an evaluation/benchmark set, the standard pre-training hygiene
  * pass (n-gram collision against held-out eval suites). Beyond-reference:
  * the reference pipeline (pandas ETL) has no corpus hygiene at all; this
  * is part of the training-data surface the engine adds (SURVEY §2.11).
  *
  * Shape, and why it scales:
  *   - benchmark n-gram hashes: explode + distinct on the BENCH side only —
  *     eval suites are tiny relative to the corpus (thousands of docs, not
  *     billions), so this side always fits a broadcast.
  *   - corpus side: explode each doc's DISTINCT n-gram hashes, then a
  *     BROADCAST equi-join against the benchmark hashes. The corpus never
  *     shuffles to find matches — the join is map-side.
  *   - only MATCHED (doc, gram) pairs reach the one real exchange (the
  *     per-doc count groupBy), and contamination is rare by construction,
  *     so the shuffled volume is ~|overlaps|, not |corpus n-grams|.
  *   - the report lists contaminated docs only; clean docs are implicitly
  *     clean (joining zero-counts back onto billions of rows would shuffle
  *     the whole corpus to say "nothing happened").
  *
  * Hashing is the portable 60-bit md5 prefix ([[TextHash.tokenHash]]) so the
  * DuckDB oracle replays it bit-exactly.
  */
object Contamination {

  /** Per-doc distinct n-gram hashes: (id, gh) exploded rows, plus the doc's
    * distinct-gram count carried through the explode (attached BEFORE the
    * explode — a map-side size(), not a join-back).
    */
  private def gramRows(docs: DataFrame, text: Column, id: Column, n: Int): DataFrame =
    docs
      .select(id.as("doc_id"),
        TextNative.wordNgramHashes(text, n, distinct = true).as("__grams"))
      .select(col("doc_id"), size(col("__grams")).as("n_grams"),
        explode(col("__grams")).as("gh"))

  /** Distinct benchmark n-gram hashes (one column `gh`). */
  def benchmarkGrams(bench: DataFrame, text: Column, n: Int): DataFrame =
    bench
      .select(explode(
        TextNative.wordNgramHashes(text, n, distinct = false)).as("gh"))
      .distinct()

  /** Contamination report: one row per training doc with ≥1 n-gram found in
    * the benchmark set — (doc_id, n_grams, n_overlap, overlap_ratio).
    * `benchGrams` is the output of [[benchmarkGrams]] (or any one-column
    * `gh` frame); it is broadcast — eval sets are small by nature.
    */
  def overlapReport(docs: DataFrame, text: Column, id: Column,
      benchGrams: DataFrame, n: Int): DataFrame =
    gramRows(docs, text, id, n)
      .join(broadcast(benchGrams), Seq("gh"))
      .groupBy("doc_id", "n_grams")
      .agg(count(lit(1)).as("n_overlap"))
      .select(col("doc_id"), col("n_grams"), col("n_overlap"),
        (col("n_overlap").cast("double") / col("n_grams").cast("double"))
          .as("overlap_ratio"))

  /** Bloom-pruned variant for benchmark sets too big to broadcast as an
    * exact hash relation (concatenated eval suites can reach 10^8 grams;
    * a bloom of 10^8 longs at 3% fpp is ~90 MB where the exact broadcast
    * HashedRelation would be several GB). Map-side `might_contain` drops
    * every gram the filter has definitely not seen BEFORE the join, so
    * only true overlaps + fpp·|grams| rows reach the (now shuffle-or-
    * broadcast, Catalyst's choice) exact join. Bit-equal to
    * [[overlapReport]] by the same argument as
    * [[Dedup.pruneDuplicatesBloom]]: false positives still pass through
    * the exact join; false negatives do not exist.
    */
  def overlapReportBloom(docs: DataFrame, text: Column, id: Column,
      benchGrams: DataFrame, n: Int, expectedGrams: Long,
      fpp: Double = 0.03): DataFrame = {
    require(expectedGrams > 0, s"expectedGrams must be positive, got $expectedGrams")
    val bf = benchGrams.stat.bloomFilter("gh", expectedGrams, fpp)
    gramRows(docs, text, id, n)
      .filter(graft.functions.Bloom.mightContain(col("gh"), bf))
      .join(benchGrams, Seq("gh"))
      .groupBy("doc_id", "n_grams")
      .agg(count(lit(1)).as("n_overlap"))
      .select(col("doc_id"), col("n_grams"), col("n_overlap"),
        (col("n_overlap").cast("double") / col("n_grams").cast("double"))
          .as("overlap_ratio"))
  }
}
