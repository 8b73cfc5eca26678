package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Portable (Spark ⇄ DuckDB bit-identical) text hashing primitives for the
  * dedup / fingerprint operators. Everything bottoms out in md5, which both
  * engines expose with identical semantics; 15 hex chars = 60 bits keeps the
  * value positive in a signed 64-bit long on both sides.
  *
  * Mirrors live in [[OracleSql]] — keep expression shapes in lockstep.
  */
object TextHash {

  /** Deterministic 60-bit hash of a string. */
  def tokenHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Whitespace tokens, empties dropped (split on single space to match the
    * oracle's string_split; consecutive spaces yield empties → filtered).
    */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => t =!= "")

  /** Distinct tokens (bag-of-words set). */
  def tokenSet(c: Column): Column = array_distinct(tokens(c))

  /** Word n-grams over the token array (n=1 → the tokens themselves).
    * Guarded: Spark's `sequence(1, 0)` counts DOWN, so short docs must
    * short-circuit to an empty array (DuckDB's generate_series is empty).
    */
  def wordNgrams(toks: Column, n: Int): Column =
    if (n == 1) toks
    else
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - lit(n - 1)), i =>
          concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*)))
        .otherwise(array().cast("array<string>"))
}
