package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** S5 — CSV scan of raw provider dumps (reference data_cleaner.py:742)
  * with the canonical OHLCV schema; schema-on-read with permissive
  * coercion happens downstream in Cleaning (F3), matching the reference's
  * `pd.to_numeric(errors="coerce")` order of operations.
  */
object Csv {

  /** Canonical raw-bar schema: everything string at the edge (the reference
    * reads untyped CSV then coerces; keeping the scan permissive means junk
    * rows become nulls in F3 instead of failing the whole file).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("symbol", StringType),
    StructField("open", StringType),
    StructField("high", StringType),
    StructField("low", StringType),
    StructField("close", StringType),
    StructField("volume", StringType)))

  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(rawSchema)
      .csv(path)

  /** Typed variant for already-clean exports (round-trips Lake.writeCsv). */
  val typedSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("ts", TimestampNTZType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", DoubleType)))

  def readTyped(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(typedSchema).csv(path)
}
