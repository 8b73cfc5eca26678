package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §7.3.3: one dominant symbol like
  * BTCUSDT is the natural skew at 100 TB).
  *
  * AQE's skew-join handling covers joins; for AGGREGATIONS over a hot key,
  * two-phase salted aggregation keeps every task bounded: phase 1 groups by
  * (key, salt) — hot keys fan out over `buckets` tasks — phase 2 merges the
  * partials per key. Only algebraic aggregates compose this way; the helper
  * takes the per-phase expressions explicitly so the caller states the
  * merge (sum→sum, count→sum, min→min, max→max...).
  */
object Skew {

  /** Deterministic salt in [0, buckets) — hashed from the full row via a
    * stable id column, not `rand()` (reproducibility under retries).
    */
  def salt(id: Column, buckets: Int): Column =
    pmod(xxhash64(id), lit(buckets.toLong))

  /** Two-phase aggregation: `phase1` aggregates within (keys, salt),
    * `phase2` merges partials per keys. Column names must line up:
    * phase2 expressions reference phase1 output aliases.
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], id: Column, buckets: Int,
      phase1: Seq[Column], phase2: Seq[Column]): DataFrame =
    df.withColumn("__salt", salt(id, buckets))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(phase1.head, phase1.tail: _*)
      .groupBy(keys: _*)
      .agg(phase2.head, phase2.tail: _*)

  /** The common case pre-wired: count + sum + min + max per key. */
  def saltedStats(df: DataFrame, key: Column, id: Column, valueCol: Column,
      buckets: Int = 16): DataFrame =
    saltedAgg(df, Seq(key), id, buckets,
      phase1 = Seq(
        count(lit(1)).as("__n"),
        sum(valueCol.cast("decimal(38,10)")).as("__s"),
        min(valueCol).as("__mn"),
        max(valueCol).as("__mx")),
      phase2 = Seq(
        sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("sum"),
        min(col("__mn")).as("min"),
        max(col("__mx")).as("max")))
}
