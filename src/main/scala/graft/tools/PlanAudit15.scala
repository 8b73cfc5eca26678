package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: round-15 plan audit — print the formatted physical plans of
  * (a) a migrated lake's split scan (id-carrying + name-mapped
  * generations, both sides expected vectorized BatchScan with pushed
  * filters on the id side), (b) a delete-free mor lake (expected: stock
  * vectorized scan, byte-identical shape to cow — the r14 fast path must
  * have survived the r15 rewiring), and (c) a pending-delete mor scan
  * (expected: `graft-mor-scan` with file-level candidate pruning and
  * every predicate re-applied above). Results recorded in BASELINE.md.
  */
object PlanAudit15 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.sinks.SnapshotLake

    // (a) migrated lake with both file generations
    val root = graft.TempDirs.create("plan15") + "/lake"
    val seed = Seq(("a", 1.5, 1L), ("b", 2.5, 2L), ("c", 3.5, 3L))
      .toDF("symbol", "close", "event_id")
    SnapshotLake.replace(spark, root, seed, statsCols = Seq("event_id"))
    SnapshotLake.upgradeFieldIds(spark, root)
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    SnapshotLake.renameColumn(spark, root, "close", "px")
    SnapshotLake.append(spark, root,
      Seq(("d", 4.5, 4L)).toDF("symbol", "px", "event_id"))
    println("===== split scan (migrated lake, filters on id + untouched cols) =====")
    spark.read.format("graft-snapshot").load(root)
      .filter(col("event_id") >= 2 && col("px") > 1.0)
      .select("symbol", "px")
      .explain("formatted")

    // (b) delete-free mor lake: must still plan the stock vectorized scan
    val mor = graft.TempDirs.create("plan15") + "/mor"
    SnapshotLake.create(spark, mor, seed.schema,
      tableProps = Map("dmlMode" -> "mor", "statsCols" -> "event_id"))
    SnapshotLake.append(spark, mor, seed, statsCols = Seq("event_id"))
    println("===== delete-free mor lake (expected: stock vectorized) =====")
    spark.read.format("graft-snapshot").load(mor)
      .filter(col("event_id") >= 2).explain("formatted")

    // (c) pending deletes: graft-mor-scan, executor-side position loads
    SnapshotLake.merge(spark, mor,
      Seq(("b", 9.9, 2L)).toDF("symbol", "close", "event_id"),
      keyCols = Seq("event_id"), versionCol = "close",
      pruneKey = "event_id")
    println("===== mor lake with pending deletes (expected: graft-mor-scan) =====")
    spark.read.format("graft-snapshot").load(mor)
      .filter(col("event_id") >= 2).explain("formatted")
    spark.stop()
  }
}
