package graft.sinks

import java.sql.Connection

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Metadata/report persistence — the reference's `MetadataDB`
  * (metadata_db.py:46-151 DDL; :153-280 insert_dataset_metadata /
  * insert_validation_report; :282-320 quality metrics), re-expressed for a
  * distributed writer:
  *
  *  - SERIAL surrogate ids are a single-writer DB concept; here
  *    `dataset_id` is a deterministic 64-bit hash of the natural key
  *    (dataset_name, provider, symbol, timeframe) — any executor, any
  *    replay, same id, no SELECT-then-INSERT round trip (the reference's
  *    check-exists/update/insert dance, metadata_db.py:168-240, IS an
  *    upsert — expressed here as ON CONFLICT DO UPDATE).
  *  - JSONB payload columns are written through Spark's `to_json` over the
  *    report map; with the PostgreSQL JDBC driver, `stringtype=unspecified`
  *    in the connection URL lets bound text coerce to JSONB server-side.
  *  - report inserts are idempotent on (dataset_id, validation_timestamp)
  *    instead of RETURNING a fresh SERIAL id — replay-safe (§2.8).
  */
object MetaStore {

  /** metadata_db.py:55-73 — dataset registry, natural-key unique. */
  val datasetMetadataSchema: StructType = StructType(Seq(
    StructField("dataset_id", LongType, nullable = false),
    StructField("dataset_name", StringType, nullable = false),
    StructField("provider", StringType, nullable = false),
    StructField("symbol", StringType),
    StructField("timeframe", StringType),
    StructField("start_date", TimestampType),
    StructField("end_date", TimestampType),
    StructField("total_records", LongType),
    StructField("file_path", StringType),
    StructField("file_size_bytes", LongType),
    StructField("metadata_json", StringType)))

  /** metadata_db.py:76-94 — per-run validation report. */
  val validationReportSchema: StructType = StructType(Seq(
    StructField("dataset_id", LongType, nullable = false),
    StructField("validation_timestamp", TimestampType, nullable = false),
    StructField("is_valid", BooleanType, nullable = false),
    StructField("total_records", LongType),
    StructField("valid_records", LongType),
    StructField("invalid_records", LongType),
    StructField("missing_values", LongType),
    StructField("outliers_detected", LongType),
    StructField("duplicates_found", LongType),
    StructField("validation_details", StringType),
    StructField("errors", StringType),
    StructField("warnings", StringType)))

  /** metadata_db.py:112-124 — one row per (dataset, metric, time). */
  val qualityMetricSchema: StructType = StructType(Seq(
    StructField("dataset_id", LongType, nullable = false),
    StructField("metric_name", StringType, nullable = false),
    StructField("calculated_at", TimestampType, nullable = false),
    StructField("metric_value", DoubleType),
    StructField("metric_details", StringType)))

  /** Deterministic dataset id from the natural key — same inputs, same id
    * on every executor and every replay (replaces SERIAL).
    */
  def datasetId(name: String, provider: String, symbol: String,
      timeframe: String): Long = {
    val key = s"$name|$provider|${Option(symbol).getOrElse("")}|${Option(timeframe).getOrElse("")}"
    // first 8 bytes of md5 as a long — stable across JVMs, no seed
    java.nio.ByteBuffer.wrap(
      java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))).getLong
  }

  /** The four-table bootstrap, statement for statement with
    * metadata_db.py:46-151 (JSONB columns swapped in over the generated
    * TEXT; indexes included). All statements are required — nothing here
    * is TimescaleDB-specific.
    */
  def bootstrapSql(): Seq[(String, Boolean)] = {
    def jsonb(sql: String, cols: Seq[String]): String =
      cols.foldLeft(sql)((s, c) => s.replace(s"$c TEXT", s"$c JSONB"))
    val lineage = StructType(Seq(
      StructField("source_dataset_id", LongType, nullable = false),
      StructField("target_dataset_id", LongType, nullable = false),
      StructField("transformation_type", StringType),
      StructField("transformation_details", StringType),
      StructField("created_at", TimestampType, nullable = false)))
    Seq(
      jsonb(JdbcDdl.createTableSql("dataset_metadata", datasetMetadataSchema,
        primaryKey = Seq("dataset_id")), Seq("metadata_json")) -> true,
      jsonb(JdbcDdl.createTableSql("validation_reports", validationReportSchema,
        primaryKey = Seq("dataset_id", "validation_timestamp")),
        Seq("validation_details", "errors", "warnings")) -> true,
      jsonb(JdbcDdl.createTableSql("data_lineage", lineage,
        primaryKey = Seq("source_dataset_id", "target_dataset_id", "created_at")),
        Seq("transformation_details")) -> true,
      jsonb(JdbcDdl.createTableSql("data_quality_metrics", qualityMetricSchema,
        primaryKey = Seq("dataset_id", "metric_name", "calculated_at")),
        Seq("metric_details")) -> true,
      JdbcDdl.createIndexSql("dataset_metadata", Seq("provider" -> false)) -> true,
      JdbcDdl.createIndexSql("dataset_metadata", Seq("symbol" -> false)) -> true,
      JdbcDdl.createIndexSql("validation_reports", Seq("dataset_id" -> false)) -> true,
      JdbcDdl.createIndexSql("data_lineage", Seq("source_dataset_id" -> false)) -> true)
  }

  def bootstrap(connect: () => Connection): Seq[String] =
    JdbcDdl.run(connect, bootstrapSql())

  /** [[graft.pipeline.Pipeline]]'s observed-metrics report → one
    * validation_reports row (insert_validation_report field mapping,
    * metadata_db.py:258-280). `validation_details` carries the FULL report
    * through `to_json`; is_valid mirrors the reference's
    * `len(errors) == 0` rule — here: no OHLC violations and no negative
    * volume.
    */
  def validationReportDf(spark: SparkSession, dsId: Long,
      report: Map[String, Any], at: java.sql.Timestamp): DataFrame = {
    def n(k: String): Long = report.get(k).collect {
      case l: Long => l
      case i: Int => i.toLong
    }.getOrElse(0L)
    val invalid = n("ohlc_violations") + n("negative_volume")
    val detailEntries = report.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(String.valueOf(v))) }
    import spark.implicits._
    Seq((dsId, at, invalid == 0L, n("rows_in"), n("rows_in") - invalid,
        invalid, n("null_close"), n("outliers_detected"), n("duplicates_found")))
      .toDF("dataset_id", "validation_timestamp", "is_valid", "total_records",
        "valid_records", "invalid_records", "missing_values",
        "outliers_detected", "duplicates_found")
      .withColumn("validation_details",
        to_json(map(detailEntries: _*)))
      .withColumn("errors", to_json(array()))
      .withColumn("warnings", to_json(array()))
  }

  /** Store the pipeline validation report (bootstrap first if needed):
    * idempotent upsert keyed (dataset_id, validation_timestamp).
    */
  def storeValidationReport(spark: SparkSession, dsId: Long,
      report: Map[String, Any], at: java.sql.Timestamp,
      connect: () => Connection): Unit =
    JdbcUpsertSink.write(validationReportDf(spark, dsId, report, at),
      "validation_reports", Seq("dataset_id", "validation_timestamp"),
      JdbcUpsertSink.DoUpdate, connect)

  /** Per-metric rows for data_quality_metrics (metadata_db.py:282-320):
    * every numeric report entry becomes (metric_name, metric_value).
    */
  def qualityMetricsDf(spark: SparkSession, dsId: Long,
      report: Map[String, Any], at: java.sql.Timestamp): DataFrame = {
    import spark.implicits._
    report.toSeq.sortBy(_._1).collect {
      case (k, v: Long) => (dsId, k, at, v.toDouble, null: String)
      case (k, v: Int) => (dsId, k, at, v.toDouble, null: String)
      case (k, v: Double) => (dsId, k, at, v, null: String)
    }.toDF("dataset_id", "metric_name", "calculated_at", "metric_value",
      "metric_details")
  }

  def storeQualityMetrics(spark: SparkSession, dsId: Long,
      report: Map[String, Any], at: java.sql.Timestamp,
      connect: () => Connection): Unit =
    JdbcUpsertSink.write(qualityMetricsDf(spark, dsId, report, at),
      "data_quality_metrics", Seq("dataset_id", "metric_name", "calculated_at"),
      JdbcUpsertSink.DoUpdate, connect)

  /** One dataset_metadata upsert row (insert_dataset_metadata,
    * metadata_db.py:153-240 — the check-then-update/insert collapsed into
    * ON CONFLICT DO UPDATE on the deterministic id).
    */
  def datasetMetadataDf(spark: SparkSession, name: String, provider: String,
      symbol: String, timeframe: String, totalRecords: Long,
      startDate: java.sql.Timestamp, endDate: java.sql.Timestamp,
      filePath: Option[String] = None, metadataJson: String = "{}"): DataFrame = {
    import spark.implicits._
    Seq((datasetId(name, provider, symbol, timeframe), name, provider, symbol,
        timeframe, startDate, endDate, totalRecords, filePath.orNull,
        null.asInstanceOf[java.lang.Long], metadataJson))
      .toDF(datasetMetadataSchema.fieldNames.toIndexedSeq: _*)
  }

  def storeDatasetMetadata(df: DataFrame, connect: () => Connection): Unit =
    JdbcUpsertSink.write(df, "dataset_metadata", Seq("dataset_id"),
      JdbcUpsertSink.DoUpdate, connect)
}
