package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-vs-database record reconciliation — the reference's status report
  * (pipeline_status_report.py:184-216): count the rows actually present in
  * the parquet lake, count the rows the database claims, and report the
  * coverage percentage per dataset key plus the overall census.
  *
  * Three count sources, one report shape (`symbol, interval, <side>_rows`):
  *  - [[lakeCounts]] — ACTUAL rows, one distributed aggregate over the
  *    archive scan (the reference's per-file pandas loop, parallelized;
  *    at 100 TB this is a column-pruned count over partition metadata,
  *    not a data read);
  *  - [[catalogCounts]] — rows CLAIMED by the file-side
  *    [[FileCatalog]] index (driver-side, dimension-sized by design);
  *  - [[dbCounts]] — rows REGISTERED in the metadata database
  *    ([[graft.sinks.MetaStore]] `dataset_metadata.total_records`, read
  *    back over JDBC in production).
  *
  * [[coverage]] joins any two sides; the joins are key-count-sized
  * (symbols × intervals — thousands, not billions), so plan cost is the
  * counting scans, never the join.
  */
object Reconcile {

  /** Actual rows per symbol in a bars-shaped lake frame, labeled with the
    * interval the lake stores. Column-pruned: only `symbol` is read.
    */
  def lakeCounts(bars: DataFrame, interval: String): DataFrame =
    bars.groupBy(col("symbol"))
      .agg(count(lit(1)).as("lake_rows"))
      .withColumn("interval", lit(interval))
      .select("symbol", "interval", "lake_rows")

  /** The FileCatalog index's claimed rows per (symbol, interval). */
  def catalogCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    FileCatalog.index(spark, dir).values.toSeq
      .map(e => (e.symbol, e.interval, e.rows))
      .toDF("symbol", "interval", "file_rows")
  }

  /** Registered rows per (symbol, timeframe) from a `dataset_metadata`
    * frame (schema [[graft.sinks.MetaStore.datasetMetadataSchema]]) —
    * summed, since several providers may register the same key.
    */
  def dbCounts(meta: DataFrame): DataFrame =
    meta.groupBy(col("symbol"), col("timeframe").as("interval"))
      .agg(sum(col("total_records")).as("db_rows"))

  /** Per-key coverage report: full-outer join of a file-side count frame
    * (`file_rows` — from [[lakeCounts]] renamed, or [[catalogCounts]])
    * with the DB side, `coverage_pct` = db/file × 100 (the reference's
    * formula), and a status the report reader can filter on:
    * MATCH / MISMATCH when both sides exist, FILE_ONLY / DB_ONLY when one
    * is missing.
    */
  def coverage(fileSide: DataFrame, dbSide: DataFrame): DataFrame = {
    val fileRows = fileSide.columns.filter(_.endsWith("_rows")) match {
      case Array(c) => col(c).as("file_rows")
      case other => throw new IllegalArgumentException(
        s"fileSide needs exactly one *_rows column, got ${other.mkString(", ")}")
    }
    fileSide.select(col("symbol"), col("interval"), fileRows)
      .join(dbSide, Seq("symbol", "interval"), "full_outer")
      .select(col("symbol"), col("interval"), col("file_rows"), col("db_rows"),
        when(col("file_rows").isNotNull && col("file_rows") > 0,
          col("db_rows").cast("double") / col("file_rows").cast("double") * 100.0)
          .as("coverage_pct"),
        when(col("file_rows").isNull, lit("DB_ONLY"))
          .when(col("db_rows").isNull, lit("FILE_ONLY"))
          .when(col("file_rows") === col("db_rows"), lit("MATCH"))
          .otherwise(lit("MISMATCH")).as("status"))
  }

  /** The one-row overall census the reference prints: total file rows,
    * total DB rows, overall coverage %, and per-status key counts.
    */
  def coverageSummary(report: DataFrame): DataFrame =
    report.agg(
      sum(col("file_rows")).as("total_file_rows"),
      sum(col("db_rows")).as("total_db_rows"),
      (sum(col("db_rows")).cast("double") /
        sum(col("file_rows")).cast("double") * 100.0).as("coverage_pct"),
      count(when(col("status") === "MATCH", 1)).as("n_match"),
      count(when(col("status") === "MISMATCH", 1)).as("n_mismatch"),
      count(when(col("status") === "FILE_ONLY", 1)).as("n_file_only"),
      count(when(col("status") === "DB_ONLY", 1)).as("n_db_only"))
}
