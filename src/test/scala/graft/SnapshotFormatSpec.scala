package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.sinks.SnapshotLake

/** The snapshot lake's registered BATCH DataSource (`graft-snapshot`):
  * plain `spark.read.format(...)` / `CREATE TABLE ... USING` reads must
  * plan through ManifestFileIndex — manifest-pruned, envelope-skipping —
  * and `df.write.format(...)` must land as ordinary lake commits. This is
  * the no-library-call doorway SQL users get; the spec pins the PLAN
  * (numFiles pruned), not just the rows.
  */
class SnapshotFormatSpec extends SparkSpec {
  import spark.implicits._

  private def bars(month: Int, n: Int, tag: Double): DataFrame =
    (0 until n).map { i =>
      (s"sym${i % 3}",
        Timestamp.valueOf(f"2024-$month%02d-10 00:${i % 60}%02d:00"),
        tag + i, i.toLong)
    }.toDF("symbol", "ts", "close", "event_id")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))

  private def freshRoot(): String = TempDirs.create("snapfmt") + "/lake"

  private def prunedScanFiles(df: DataFrame): (Long, Long) = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.size == 1, s"expected one file scan, got ${scans.size}")
      val rows = df.collect().length.toLong
      (scans.head.metrics("numFiles").value, rows)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("format write lands as lake commits; format read plans through " +
      "the manifest and PRUNES files on a pushed-down filter") {
    val root = freshRoot()
    bars(1, 30, 0.0).repartition(2).write.format("graft-snapshot")
      .option("statsCols", "close").save(root)
    bars(2, 30, 1000.0).repartition(2).write.format("graft-snapshot")
      .mode(SaveMode.Append).option("statsCols", "close").save(root)
    val m = SnapshotLake.manifest(spark, root)
    assert(m.version == 2 && m.op == "append" && m.files.size == 4)
    val nAll = m.files.size
    val df = spark.read.format("graft-snapshot").load(root)
      .filter(col("close") >= 1000.0)
    val (numFiles, rows) = prunedScanFiles(df)
    assert(rows == 30)
    assert(numFiles > 0 && numFiles < nAll,
      s"expected manifest pruning through the format: $numFiles of $nAll")
    // row identity vs the pinned library read
    val full = SnapshotLake.read(spark, root).filter(col("close") >= 1000.0)
    assert(df.exceptAll(full).isEmpty && full.exceptAll(df).isEmpty)
  }

  test("CREATE TABLE ... USING graft-snapshot: SQL SELECTs prune files " +
      "through the manifest with no library call") {
    val root = freshRoot()
    bars(1, 24, 0.0).repartition(2).write.format("graft-snapshot")
      .option("statsCols", "close").save(root)
    bars(2, 24, 500.0).repartition(2).write.format("graft-snapshot")
      .mode(SaveMode.Append).option("statsCols", "close").save(root)
    val nAll = SnapshotLake.manifest(spark, root).files.size
    spark.sql(s"CREATE TABLE snapfmt_sql USING `graft-snapshot` " +
      s"OPTIONS (path '$root')")
    try {
      val df = spark.sql(
        "SELECT symbol, close FROM snapfmt_sql WHERE close >= 500.0")
      val (numFiles, rows) = prunedScanFiles(df)
      assert(rows == 24)
      assert(numFiles > 0 && numFiles < nAll,
        s"expected SQL-path pruning: $numFiles of $nAll")
    } finally spark.sql("DROP TABLE snapfmt_sql")
  }

  test("versionAsOf time travel; overwrite mode is an atomic REPLACE; " +
      "ErrorIfExists and Ignore honor their contracts") {
    val root = freshRoot()
    bars(1, 10, 0.0).write.format("graft-snapshot").save(root) // v1
    bars(2, 5, 100.0).write.format("graft-snapshot")
      .mode(SaveMode.Append).save(root) // v2
    assert(spark.read.format("graft-snapshot")
      .option("versionAsOf", "1").load(root).count() == 10)
    assert(spark.read.format("graft-snapshot").load(root).count() == 15)
    // overwrite = REPLACE: one commit, wholesale new contents
    bars(3, 7, 900.0).write.format("graft-snapshot")
      .mode(SaveMode.Overwrite).save(root)
    assert(spark.read.format("graft-snapshot").load(root).count() == 7)
    assert(SnapshotLake.manifest(spark, root).op == "replace")
    // pinned history survives the replace
    assert(spark.read.format("graft-snapshot")
      .option("versionAsOf", "2").load(root).count() == 15)
    val e = intercept[Exception] {
      bars(4, 3, 0.0).write.format("graft-snapshot")
        .mode(SaveMode.ErrorIfExists).save(root)
    }
    assert(e.getMessage.contains("already exists"))
    bars(4, 3, 0.0).write.format("graft-snapshot")
      .mode(SaveMode.Ignore).save(root) // no-op
    assert(spark.read.format("graft-snapshot").load(root).count() == 7)
    // default mode (ErrorIfExists) on a FRESH root creates the lake
    val root2 = freshRoot()
    bars(5, 4, 0.0).write.format("graft-snapshot").save(root2)
    assert(spark.read.format("graft-snapshot").load(root2).count() == 4)
  }

  test("SQL INSERT INTO / INSERT OVERWRITE cannot bypass the manifest: " +
      "both refuse before touching a file, and the lake is unchanged") {
    val root = freshRoot()
    bars(1, 10, 0.0).write.format("graft-snapshot")
      .option("statsCols", "close").save(root)
    val before = SnapshotLake.manifest(spark, root)
    spark.sql(s"CREATE TABLE snapfmt_ins USING `graft-snapshot` " +
      s"OPTIONS (path '$root')")
    try {
      // a direct INSERT would write parquet under data/ with no manifest
      // commit (invisible rows); INSERT OVERWRITE would DELETE data files
      // a pinned manifest still references. Both must fail up front.
      intercept[Exception] {
        spark.sql("INSERT INTO snapfmt_ins SELECT * FROM snapfmt_ins")
      }
      intercept[Exception] {
        spark.sql("INSERT OVERWRITE snapfmt_ins SELECT * FROM snapfmt_ins")
      }
      val after = SnapshotLake.manifest(spark, root)
      assert(after.version == before.version &&
        after.files.map(_.rel) == before.files.map(_.rel),
        "INSERT must not have changed the lake")
      assert(SnapshotLake.read(spark, root).count() == 10)
      // the supported write path still lands as a manifest commit; the
      // catalog caches the resolved relation (standard V1 semantics, same
      // as a parquet table), so out-of-band commits need REFRESH TABLE
      bars(2, 5, 100.0).write.format("graft-snapshot")
        .mode(SaveMode.Append).save(root)
      spark.sql("REFRESH TABLE snapfmt_ins")
      assert(spark.sql("SELECT * FROM snapfmt_ins").count() == 15)
    } finally spark.sql("DROP TABLE snapfmt_ins")
  }

  test("a hive-partitioned lake refuses the pruned batch relation loudly") {
    val root = freshRoot()
    bars(1, 12, 0.0).write.format("graft-snapshot")
      .option("partitionCols", "symbol").save(root)
    // the write itself landed partitioned
    assert(SnapshotLake.read(spark, root).count() == 12)
    val e = intercept[Exception] {
      spark.read.format("graft-snapshot").load(root).collect()
    }
    assert(e.getMessage.contains("unpartitioned"))
  }
}
