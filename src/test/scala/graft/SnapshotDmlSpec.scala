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

  test("translatable UPDATE conditions prune the rewrite to envelope-" +
      "overlapping files — untouched files survive by IDENTITY and no " +
      "row is lost to parquet row-filter pushdown") {
    val root = TempDirs.create("snapdml-prune") + "/lake"
    // two value-clustered files: event_id 0..5 and 6..11
    bars(12, 0.0).repartitionByRange(2, col("event_id"))
      .sortWithinPartitions("event_id")
      .write.format("graft-snapshot").option("statsCols", "event_id")
      .save(root)
    val before = SnapshotLake.manifest(spark, root)
    assert(before.files.size == 2)
    val untouched = before.files.filter(_.stats("event_id")._2 < 6.0)
    assert(untouched.size == 1, s"want one low file, got ${before.files}")
    spark.sql("DROP TABLE IF EXISTS snapdml_prune")
    spark.sql(s"CREATE TABLE snapdml_prune USING `graft-snapshot` " +
      s"OPTIONS (path '$root')")
    spark.sql("UPDATE snapdml_prune SET close = close + 1000 " +
      "WHERE event_id >= 6")
    val after = SnapshotLake.manifest(spark, root)
    assert(after.op == "update:sql")
    // the row-loss tripwire: a pushed parquet row filter would have
    // dropped the low file's rows from the full-snapshot rewrite
    assert(spark.sql("SELECT * FROM snapdml_prune").count() == 12)
    assert(spark.sql(
      "SELECT * FROM snapdml_prune WHERE close >= 1000").count() == 6)
    // the scale contract: the non-overlapping file was never rewritten
    assert(after.files.map(_.rel).contains(untouched.head.rel),
      s"low file must survive by identity: ${after.files.map(_.rel)}")
    assert(!after.files.map(_.rel).exists(r =>
      before.files.exists(f => f.rel == r && f.stats("event_id")._1 >= 6.0)),
      "the high file must have been replaced")
    spark.sql("DROP TABLE snapdml_prune")
  }

  test("keyed SQL MERGE: runtime group filtering narrows the rewrite to " +
      "the files the join actually matched; a no-match UPDATE is a " +
      "version no-op") {
    val root = TempDirs.create("snapdml-rt") + "/lake"
    // four value-clustered files: 0..2 / 3..5 / 6..8 / 9..11
    bars(12, 0.0).repartitionByRange(4, col("event_id"))
      .sortWithinPartitions("event_id")
      .write.format("graft-snapshot").option("statsCols", "close").save(root)
    // statsCols deliberately EXCLUDE event_id: static envelope pruning
    // sees nothing, so any narrowing below is the RUNTIME filter's work
    val before = SnapshotLake.manifest(spark, root)
    assert(before.files.size == 4)
    spark.sql("DROP TABLE IF EXISTS snapdml_rt")
    spark.sql(s"CREATE TABLE snapdml_rt USING `graft-snapshot` " +
      s"OPTIONS (path '$root')")
    bars(2, 900.0).createOrReplaceTempView("snapdml_rt_src") // ids 0,1
    spark.sql("""
      MERGE INTO snapdml_rt t USING snapdml_rt_src s
      ON t.event_id = s.event_id
      WHEN MATCHED THEN UPDATE SET close = s.close
    """)
    val after = SnapshotLake.manifest(spark, root)
    assert(after.op == "merge:sql")
    assert(spark.sql("SELECT * FROM snapdml_rt").count() == 12)
    assert(spark.sql(
      "SELECT * FROM snapdml_rt WHERE close >= 900").count() == 2)
    // only the one file holding event_id 0..2 may be replaced: the other
    // three survive by identity (runtime group filtering at work)
    val carried = before.files.map(_.rel).toSet
      .intersect(after.files.map(_.rel).toSet)
    assert(carried.size == 3,
      s"3 of 4 files must ride through untouched, carried=$carried")
    // an UPDATE matching nothing publishes NO new version
    val vBefore = after.version
    spark.sql("UPDATE snapdml_rt SET close = 0 WHERE event_id = 99999")
    assert(SnapshotLake.manifest(spark, root).version == vBefore,
      "no-match UPDATE must be a commit no-op")
    spark.sql("DROP TABLE snapdml_rt")
  }

  test("SQL DML on a hive-partitioned lake: rows route to per-partition " +
      "files, partition-scoped statements rewrite only that partition, " +
      "and version pins still refuse") {
    val root = TempDirs.create("snapdml-part") + "/lake"
    bars(9, 0.0).write.format("graft-snapshot")
      .option("partitionCols", "symbol").save(root)
    spark.sql("DROP TABLE IF EXISTS snapdml_part")
    spark.sql(s"CREATE TABLE snapdml_part USING `graft-snapshot` " +
      s"OPTIONS (path '$root')")
    val before = SnapshotLake.manifest(spark, root)
    val untouchedRels = before.files.filterNot(_.rel.startsWith("symbol=sym1"))
      .map(_.rel).toSet
    assert(untouchedRels.nonEmpty)
    // partition-scoped UPDATE: static pruning keeps other partitions out
    spark.sql("UPDATE snapdml_part SET close = close + 1000 " +
      "WHERE symbol = 'sym1'")
    val after = SnapshotLake.manifest(spark, root)
    assert(after.op == "update:sql")
    assert(spark.sql("SELECT * FROM snapdml_part").count() == 9)
    assert(spark.sql("SELECT * FROM snapdml_part WHERE close >= 1000")
      .count() == 3)
    assert(after.files.forall(_.rel.startsWith("symbol=")),
      s"rewritten rows must land hive-routed, got ${after.files.map(_.rel)}")
    assert(untouchedRels.subsetOf(after.files.map(_.rel).toSet),
      "other partitions must survive by identity")
    // MERGE across partitions routes every surviving row correctly
    bars(4, 500.0).createOrReplaceTempView("snapdml_part_src")
    spark.sql("""
      MERGE INTO snapdml_part t USING snapdml_part_src s
      ON t.event_id = s.event_id
      WHEN MATCHED THEN UPDATE SET close = s.close
      WHEN NOT MATCHED THEN INSERT *
    """)
    assert(spark.sql("SELECT * FROM snapdml_part").count() == 9)
    assert(spark.sql("SELECT * FROM snapdml_part WHERE close >= 500 " +
      "AND close < 1000").count() == 4)
    assert(SnapshotLake.manifest(spark, root).files
      .forall(_.rel.startsWith("symbol=")))
    // reads by partition stay consistent after DML
    assert(spark.sql(
      "SELECT * FROM snapdml_part WHERE symbol = 'sym0'").count() == 3)
    intercept[Exception] {
      spark.read.format("graft-snapshot").option("versionAsOf", "1")
        .load(root).createOrReplaceTempView("snapdml_part_pin")
      spark.sql("UPDATE snapdml_part_pin SET close = 0")
    }
    spark.sql("DROP TABLE snapdml_part")
  }

  test("TIMESTAMP-typed partition columns prune DML candidates through " +
      "the writer's own Cast-to-string rendering — the matched partition " +
      "is rewritten, the others survive by identity") {
    // the round-13 hazard: filter literals rendered via String.valueOf
    // ('2024-01-10 00:01:00.0' for java.sql.Timestamp, '2024-01-10T00:01'
    // for LocalDateTime) never equal the directory value Cast rendered
    // ('2024-01-10 00:01:00'), so the static prune would wrongly exclude
    // EVERY file and the UPDATE silently skipped its matched rows
    val root = TempDirs.create("snapdml-tspart") + "/lake"
    (0 until 9).map { i =>
      (Timestamp.valueOf(f"2024-01-10 00:0${i % 3}%01d:00"), 0.0 + i,
        i.toLong)
    }.toDF("day", "close", "event_id")
      .withColumn("day", col("day").cast("timestamp_ntz"))
      .write.format("graft-snapshot").option("partitionCols", "day")
      .save(root)
    spark.sql("DROP TABLE IF EXISTS snapdml_tspart")
    spark.sql(s"CREATE TABLE snapdml_tspart USING `graft-snapshot` " +
      s"OPTIONS (path '$root')")
    val before = SnapshotLake.manifest(spark, root)
    val otherRels = before.files
      .filterNot(_.rel.contains("00%3A01%3A00")).map(_.rel).toSet
    assert(otherRels.nonEmpty && otherRels.size < before.files.size,
      s"fixture must be partitioned by the escaped timestamp: " +
        before.files.map(_.rel))
    spark.sql("UPDATE snapdml_tspart SET close = close + 1000 " +
      "WHERE day = TIMESTAMP_NTZ'2024-01-10 00:01:00'")
    // the matched rows actually updated (no silent skip)...
    assert(spark.sql(
      "SELECT * FROM snapdml_tspart WHERE close >= 1000").count() == 3)
    assert(spark.sql("SELECT * FROM snapdml_tspart").count() == 9)
    // ...and the prune was real: every other partition's file survived
    // by identity
    val after = SnapshotLake.manifest(spark, root)
    assert(otherRels.subsetOf(after.files.map(_.rel).toSet),
      "non-matching timestamp partitions must survive by identity")
    spark.sql("DROP TABLE snapdml_tspart")
  }

  test("the _file metadata column serves file provenance on plain reads " +
      "with zero data I/O") {
    val root = freshTable("snapdml_file", 12)
    val rels = SnapshotLake.manifest(spark, root).files.map(_.rel).toSet
    val seen = spark.sql(
      "SELECT DISTINCT _file FROM snapdml_file").collect()
      .map(_.getString(0)).toSet
    assert(seen == rels, s"_file must be the manifest rel paths: $seen")
    // groupable like any column
    assert(spark.sql("SELECT _file, count(*) c FROM snapdml_file " +
      "GROUP BY _file").collect().map(_.getLong(1)).sum == 12)
    spark.sql("DROP TABLE snapdml_file")
  }
}
