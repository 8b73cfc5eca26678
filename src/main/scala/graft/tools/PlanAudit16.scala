package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: round-16 plan audit — print the formatted physical plans of
  * (a) a partition-spec-evolved lake (two dir-layout generations in one
  * BatchScan; BOTH sides expected vectorized — ColumnarToRow above the
  * scan — with partition pruning served per generation from its own
  * dirs), (b) the same lake filtered on a column that is DATA in one
  * generation and a DIR in the other (pushed to the parquet scan on the
  * data side, dir-pruned on the other, re-applied above on both), and
  * (c) the post-compact lake (expected: the plain single-scan path
  * resumed, no `graft-split-scan`). Results recorded in BASELINE.md.
  */
object PlanAudit16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.sinks.SnapshotLake

    val root = graft.TempDirs.create("plan16") + "/lake"
    val genA = (0L until 1000L)
      .map(i => (2023L + i % 2, s"s${i % 3}", i.toDouble, i))
      .toDF("y", "sym", "close", "event_id")
    SnapshotLake.append(spark, root, genA.repartition(2),
      partitionCols = Seq("y"), statsCols = Seq("event_id"))
    SnapshotLake.repartitionSpec(spark, root, Seq("y", "sym"))
    val genB = (1000L until 2000L)
      .map(i => (2025L + i % 2, s"s${i % 3}", i.toDouble, i))
      .toDF("y", "sym", "close", "event_id")
    SnapshotLake.append(spark, root, genB.repartition(2),
      partitionCols = Seq("y", "sym"), statsCols = Seq("event_id"))

    println("===== evolved lake, full read (expected: ONE BatchScan, " +
      "graft-split-scan, ColumnarToRow both generations) =====")
    spark.read.format("graft-snapshot").load(root).explain("formatted")

    println("===== filter on sym (DATA col in gen A, DIR col in gen B: " +
      "pushed on A, dir-pruned on B, re-applied above) =====")
    spark.read.format("graft-snapshot").load(root)
      .filter(col("sym") === "s1" && col("event_id") >= 500)
      .select("sym", "event_id", "close")
      .explain("formatted")

    SnapshotLake.compact(spark, root, partitionCols = Seq("y", "sym"))
    println("===== post-compact (expected: plain single scan, no " +
      "graft-split-scan) =====")
    spark.read.format("graft-snapshot").load(root)
      .filter(col("sym") === "s1").explain("formatted")
    spark.stop()
  }
}
