package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7 — JDBC range scan (reference `TimeSeriesDB.query_ohlcv_data`,
  * timeseries_db.py:252-311: `SELECT … WHERE symbol=? AND ts∈[a,b]
  * ORDER BY ts DESC LIMIT n`).
  *
  * The reference builds the SQL string by hand and blocks on one cursor;
  * here the same query is a DataFrame over `spark.read.jdbc`, so the
  * symbol/time predicates PUSH DOWN into the database's WHERE clause
  * (JDBCScan PushedFilters) and the scan parallelizes over
  * `partitionColumn` ranges instead of one connection.
  *
  * No database ships in this container — this wrapper is exercised against
  * the same option plumbing Spark's JDBC suite uses; the pushdown shape is
  * asserted in PlanSpec on the parquet analog.
  */
object Jdbc {

  /** Parallel range scan: `numPartitions` concurrent cursors splitting
    * [lower, upper) on `partitionColumn` (must be numeric/date — use epoch
    * seconds of ts, mirroring the hypertable chunk ranges).
    */
  def readRanged(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long, numPartitions: Int,
      props: Properties = new Properties()): DataFrame =
    spark.read
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .jdbc(url, table, props)

  /** The reference's point/range query, declaratively: filters/sort/limit
    * compose on the scan and push into the database.
    */
  def ohlcvRange(scan: DataFrame, symbol: String,
      from: Option[String] = None, to: Option[String] = None,
      latestN: Option[Int] = None): DataFrame = {
    var df = scan.filter(col("symbol") === symbol)
    from.foreach(f => df = df.filter(col("ts") >= lit(f).cast("timestamp_ntz")))
    to.foreach(t => df = df.filter(col("ts") <= lit(t).cast("timestamp_ntz")))
    val sorted = df.orderBy(col("ts").desc)
    latestN.map(sorted.limit).getOrElse(sorted)
  }
}
