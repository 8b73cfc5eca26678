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
    *
    * Built as a zip_with fold over n SHIFTED SLICES of the array — NOT as
    * `transform(sequence(...), i -> concat(element_at(toks, i+k)...))`:
    * Catalyst does not CSE across lambda boundaries, so each
    * `element_at(toks, ·)` in a lambda body re-evaluates the whole `toks`
    * subtree (for `tokens(text)` that re-runs split+filter), turning the
    * gram build into O(grams × n) tokenizations per row. Measured on the
    * x6/x7/d8/dc1 suite queries: 31.3 → sub-second for x6 at sf0.1. The
    * slice/zip_with form evaluates `toks` O(n) times per row, with the
    * lambdas touching only their bound variables.
    *
    * Guarded: short docs short-circuit to an empty array (`when` branches
    * evaluate lazily, so the negative slice length is never computed;
    * DuckDB's generate_series mirror is empty there too).
    */
  def wordNgrams(toks: Column, n: Int): Column =
    if (n == 1) toks
    else {
      val m = size(toks) - lit(n - 1)
      val grams = (2 to n).foldLeft(slice(toks, lit(1), m)) { (acc, k) =>
        zip_with(acc, slice(toks, lit(k), m), (a, b) => concat(a, lit(" "), b))
      }
      when(size(toks) >= n, grams)
        .otherwise(array().cast("array<string>"))
    }
}
