package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.SnapshotLake

/** SQL MERGE INTO / UPDATE / arbitrary-predicate DELETE on snapshot
  * lakes — the group-based copy-on-write row-level path
  * (SnapshotRowLevelOperation): each statement is ONE atomic commit, the
  * distributed write goes through the DSv2 BatchWrite into the lake's
  * stage-dir convention, and translatable DELETEs still take the fast
  * metadata path.
  */
class SnapshotDmlSpec extends SparkSpec {
  import spark.implicits._

  private def bars(n: Int, tag: Double): DataFrame =
    (0 until n).map { i =>
      (s"sym${i % 3}",
        Timestamp.valueOf(f"2024-01-10 00:${i % 60}%02d:00"), tag + i,
        i.toLong)
    }.toDF("symbol", "ts", "close", "event_id")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))

  private def freshTable(name: String, n: Int): String = {
    val root = TempDirs.create("snapdml") + "/lake"
    bars(n, 0.0).repartition(2).write.format("graft-snapshot")
      .option("statsCols", "event_id").save(root)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING `graft-snapshot` " +
      s"OPTIONS (path '$root')")
    root
  }

  test("UPDATE: one atomic copy-on-write commit; pinned history intact") {
    val root = freshTable("snapdml_upd", 12)
    val before = SnapshotLake.manifest(spark, root)
    spark.sql("UPDATE snapdml_upd SET close = close + 1000 " +
      "WHERE event_id % 2 = 0")
    val after = SnapshotLake.manifest(spark, root)
    assert(after.op == "update:sql" && after.version == before.version + 1)
    assert(spark.sql(
      "SELECT * FROM snapdml_upd WHERE close >= 1000").count() == 6)
    assert(spark.sql("SELECT * FROM snapdml_upd").count() == 12)
    // time travel across the update
    assert(spark.read.format("graft-snapshot")
      .option("versionAsOf", before.version.toString).load(root)
      .filter(col("close") >= 1000).count() == 0)
    spark.sql("DROP TABLE snapdml_upd")
  }

  test("MERGE INTO: matched-update + not-matched-insert + " +
      "not-matched-by-source-delete in ONE commit") {
    freshTable("snapdml_m", 10) // event_ids 0..9
    bars(6, 500.0) // ids 0..5 (collide) — shift 3 of them beyond
      .withColumn("event_id",
        when(col("event_id") < 3, col("event_id"))
          .otherwise(col("event_id") + 100L))
      .createOrReplaceTempView("snapdml_src")
    spark.sql("""
      MERGE INTO snapdml_m t USING snapdml_src s
      ON t.event_id = s.event_id
      WHEN MATCHED THEN UPDATE SET close = s.close
      WHEN NOT MATCHED THEN INSERT *
    """)
    // ids 0,1,2 updated to 500.x; ids 103,104,105 inserted; 0..9 kept
    assert(spark.sql("SELECT * FROM snapdml_m").count() == 13)
    assert(spark.sql(
      "SELECT * FROM snapdml_m WHERE event_id < 3 AND close >= 500")
      .count() == 3)
    assert(spark.sql(
      "SELECT * FROM snapdml_m WHERE event_id > 100").count() == 3)
    // second merge: delete rows the source no longer carries
    spark.sql("""
      MERGE INTO snapdml_m t USING snapdml_src s
      ON t.event_id = s.event_id
      WHEN MATCHED THEN UPDATE SET close = s.close + 1
      WHEN NOT MATCHED BY SOURCE THEN DELETE
    """)
    assert(spark.sql("SELECT * FROM snapdml_m").count() == 6)
    spark.sql("DROP TABLE snapdml_m")
  }

  test("DELETE dispatch: translatable predicates stay on the metadata " +
      "path (file-pruned delete commit); untranslatable predicates run " +
      "the copy-on-write rewrite instead of refusing") {
    val root = freshTable("snapdml_del", 12)
    spark.sql("DELETE FROM snapdml_del WHERE event_id >= 10")
    val m1 = SnapshotLake.manifest(spark, root)
    assert(m1.op == "delete",
      s"ranged delete must stay metadata-path, got ${m1.op}")
    assert(spark.sql("SELECT * FROM snapdml_del").count() == 10)
    spark.sql("DELETE FROM snapdml_del WHERE event_id % 2 = 0")
    val m2 = SnapshotLake.manifest(spark, root)
    assert(m2.op == "delete:sql",
      s"modulo delete must run the row-level rewrite, got ${m2.op}")
    assert(spark.sql("SELECT * FROM snapdml_del").count() == 5)
    spark.sql("DROP TABLE snapdml_del")
  }

  test("row-level DML refuses hive-partitioned lakes and version pins " +
      "loudly") {
    val root = TempDirs.create("snapdml-part") + "/lake"
    bars(9, 0.0).write.format("graft-snapshot")
      .option("partitionCols", "symbol").save(root)
    spark.sql("DROP TABLE IF EXISTS snapdml_part")
    spark.sql(s"CREATE TABLE snapdml_part USING `graft-snapshot` " +
      s"OPTIONS (path '$root')")
    val e = intercept[Exception] {
      spark.sql("UPDATE snapdml_part SET close = 0 WHERE event_id % 2 = 0")
    }
    assert(e.getMessage.contains("partitioned"))
    spark.sql("DROP TABLE snapdml_part")
  }
}
