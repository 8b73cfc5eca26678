package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated testdata tables (TESTDATA.md) plus the
  * shared dirty-OHLCV `bars` fixture that the quality / resample / indicator
  * operators run on.
  *
  * Scale notes: every loader is a plain parquet scan — Catalyst pushes
  * filters/projections into the scan, so callers compose freely. At 100 TB
  * the same loaders work on a directory lake (multi-file parquet); nothing
  * here materializes on the driver.
  */
object Tables {

  /** events.parquet's `ts` column has shipped under two physical types across
    * testdata generations: INT64 TIMESTAMP(NANOS) (which Spark cannot read
    * natively — PARQUET_TYPE_ILLEGAL) and plain parquet TIMESTAMP(MICROS).
    * Branch on the SCANNED dtype rather than assuming either:
    *   - LongType (nanosAsLong):   integer `ts div 1000` floors exactly like
    *     DuckDB's nanos→micros truncation, so oracle comparisons line up.
    *   - TimestampNTZType:         already the canonical type — use as-is.
    *   - TimestampType (LTZ):      cast to NTZ under the pinned UTC session
    *     TZ, which makes the wall-clock equal the raw epoch micros.
    * Every downstream operator sees one canonical TIMESTAMP_NTZ `ts`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The LTZ->NTZ cast below shifts by the session TZ; pin it to UTC so the
    // wall-clock values are the raw epoch micros regardless of caller env.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        // `div` = integral division: epoch nanos (~1.7e18) overflow double's
        // 53-bit mantissa, so `/` (fractional) would corrupt timestamps.
        raw.withColumn(
          "ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case TimestampNTZType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampNTZType))
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/region.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/nation.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Dirty OHLCV bars derived deterministically from `events`, mirroring the
    * reference's canonical bar schema (reference data_cleaner.py:53-54:
    * timestamp/open/high/low/close/volume + symbol). Dirt injected:
    *   - close NULL when event_id % 11 = 0            (F8 ffill/bfill)
    *   - high < low when event_id % 13 = 0            (F6/F7 OHLC repair)
    *   - negative volume for user_id % 100 < 5        (F5 non-negative)
    * The SQL mirror is [[barsSql]]; both must stay expression-for-expression
    * identical so doubles match bit-for-bit against the DuckDB oracle.
    */
  def bars(spark: SparkSession, dir: String): DataFrame = {
    val raw = events(spark, dir).select(
      col("event_id"),
      col("event_type").as("symbol"),
      col("ts"),
      col("value").as("open"),
      when(col("event_id") % 11 === 0, lit(null).cast(DoubleType))
        .otherwise(col("value") * (lit(1.0) +
          ((col("event_id") % 7).cast(DoubleType) - lit(3.0)) / lit(100.0)))
        .as("close"),
      ((col("user_id") % 100).cast(DoubleType) - lit(5.0)).as("volume")
    )
    val body = greatest(col("open"), coalesce(col("close"), col("open")))
    val lo = least(col("open"), coalesce(col("close"), col("open"))) *
      (lit(1.0) - (col("event_id") % 3).cast(DoubleType) / lit(1000.0))
    val hi = body * (lit(1.0) + (col("event_id") % 5).cast(DoubleType) / lit(1000.0))
    raw.select(
      col("event_id"),
      col("symbol"),
      col("ts"),
      col("open"),
      when(col("event_id") % 13 === 0, lo * lit(0.98)).otherwise(hi).as("high"),
      lo.as("low"),
      col("close"),
      col("volume")
    )
  }

  /** DuckDB CTE mirroring [[bars]] exactly. Prepend to any oracle SQL that
    * queries `bars`. Assumes the driver registers the raw tables by name.
    */
  val barsSql: String =
    """WITH bars_raw AS (
      |  SELECT event_id, event_type AS symbol, CAST(ts AS TIMESTAMP) AS ts,
      |         value AS open,
      |         CASE WHEN event_id % 11 = 0 THEN NULL
      |              ELSE value * (1.0 + (CAST(event_id % 7 AS DOUBLE) - 3.0) / 100.0)
      |         END AS close,
      |         CAST(user_id % 100 AS DOUBLE) - 5.0 AS volume
      |  FROM events
      |), bars AS (
      |  SELECT event_id, symbol, ts, open,
      |         CASE WHEN event_id % 13 = 0
      |              THEN least(open, coalesce(close, open)) * (1.0 - CAST(event_id % 3 AS DOUBLE) / 1000.0) * 0.98
      |              ELSE greatest(open, coalesce(close, open)) * (1.0 + CAST(event_id % 5 AS DOUBLE) / 1000.0)
      |         END AS high,
      |         least(open, coalesce(close, open)) * (1.0 - CAST(event_id % 3 AS DOUBLE) / 1000.0) AS low,
      |         close, volume
      |  FROM bars_raw
      |)""".stripMargin
}
