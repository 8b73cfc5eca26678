package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.epochUs

/** Range (interval) join: match point events to [start, end] intervals on a
  * shared key-less or keyed time axis — e.g. ticks → trading sessions,
  * events → maintenance windows.
  *
  * Spark plans a naive `l.ts BETWEEN r.start AND r.end` join as
  * BroadcastNestedLoopJoin — O(|L|·|R|) and a guaranteed 100 TB cliff. This
  * operator buckets time into fixed chunks: each interval is exploded onto
  * every chunk it overlaps (intervals ≪ points, so the explosion is the
  * small side), points map to exactly one chunk, and the join becomes an
  * EQUI-join on (keys…, chunk) + a residual between-filter. Shuffle volume
  * is O(|L| + |R|·avgChunksPerInterval); pick `bucket` ≈ the typical
  * interval length.
  */
object RangeJoin {

  /** @param points    point rows with time column `ts`
    * @param intervals interval rows with `startCol`/`endCol` (inclusive)
    * @param on        optional equi-keys present in both sides
    * @param bucketUs  chunk width in microseconds
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, on: Seq[String],
      ts: String, startCol: String, endCol: String, bucketUs: Long): DataFrame = {
    val p = points.withColumn("__chunk", floor(epochUs(col(ts)) / bucketUs))
    val iv = intervals.withColumn("__chunk",
      explode(sequence(
        floor(epochUs(col(startCol)) / bucketUs),
        floor(epochUs(col(endCol)) / bucketUs))))
    p.join(iv, on :+ "__chunk")
      .filter(col(ts) >= col(startCol) && col(ts) <= col(endCol))
      .drop("__chunk")
  }
}
