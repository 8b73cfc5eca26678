package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Text-analysis operators for large-scale training-data pipelines (beyond
  * the reference per the build brief): token counting, language-ID heuristic,
  * quality scoring, document fingerprinting.
  *
  * Everything here is a pure codegen'd Column expression over the token
  * array — no explode, no shuffle, no UDF — so a quality-score pass over
  * 100 TB of documents is a single map-only scan. The DuckDB mirrors live
  * next to each query in [[TextQueries]]; integer-ratio arithmetic keeps the
  * doubles bit-identical across engines.
  */
object TextOps {

  /** Stopword list for the language-ID / quality heuristics (tiny on
    * purpose: a real deployment swaps in per-language tables — the operator
    * shape is what matters).
    */
  val EnStopwords: Seq[String] = Seq("the", "a", "an", "of", "to", "in", "is", "and")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(TextHash.tokens(text))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * other non-space characters — the classic pre-tokenizer regex.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Fraction of tokens that are stopwords (0 for empty docs). */
  def stopwordRatio(text: Column): Column = {
    val toks = TextHash.tokens(text)
    val stops = filter(toks, t => t.isInCollection(EnStopwords))
    when(size(toks) > 0, size(stops).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** n-gram-frequency language ID heuristic: stopword-hit ratio over a
    * per-language function-word profile; `en` when the ratio clears the
    * threshold. (Real language-ID adds char-trigram profiles per language;
    * the operator is the same single-pass expression shape.)
    */
  def langId(text: Column, threshold: Double = 0.05): Column =
    when(stopwordRatio(text) >= threshold, lit("en")).otherwise(lit("unk"))

  /** Document quality score in [0,1]: equal-weight blend of
    * length score (tokens/50 capped at 1), alphabetic-token ratio,
    * type-token diversity, and closeness of the stopword ratio to a
    * natural-text ~0.4 (mirrors the reference's weighted quality score
    * shape, data_validator.py:135-186, re-targeted at text).
    */
  def qualityScore(text: Column): Column = {
    val toks = TextHash.tokens(text)
    val n = size(toks).cast("double")
    val lenScore = least(lit(1.0), n / lit(50.0))
    val alphaRatio =
      size(filter(toks, t => t.rlike("^[a-z]+$"))).cast("double") / n
    val diversity = size(array_distinct(toks)).cast("double") / n
    val stopCloseness =
      lit(1.0) - abs(stopwordRatio(text) - lit(0.4))
    when(n > 0,
      (lenScore + alphaRatio + diversity + stopCloseness) * lit(0.25))
      .otherwise(lit(0.0))
  }

  /** Text normalization for dedup robustness: lowercase, strip
    * non-alphanumerics to spaces, collapse whitespace — so formatting
    * variants of the same content fingerprint identically. Pure codegen
    * expression chain.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Order-sensitive rolling-hash fingerprint of the token stream:
    * h := (h*31 + tokenHash(t) mod P) mod P over tokens left-to-right,
    * P = 2^31−1. Detects exact token-sequence duplicates regardless of
    * whitespace/formatting; cheap enough to store as a content key.
    */
  def fingerprint(text: Column, p: Long = 2147483647L): Column =
    aggregate(
      TextHash.tokens(text),
      lit(0L),
      (acc, t) => (acc * lit(31L) + TextHash.tokenHash(t) % lit(p)) % lit(p))
}
