package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.sinks.SnapshotLake

/** The snapshot lake's registered DataSource (`graft-snapshot`), now a
  * DSv2 TableProvider: `spark.read.format(...)` / `CREATE TABLE ...
  * USING` plan a manifest-pinned SnapshotTable scan (partition- and
  * envelope-pruned, vectorized parquet), SQL `INSERT INTO/OVERWRITE`
  * land as manifest commits, and `df.write.format(...)` keeps the V1
  * save-mode contracts. The spec pins the PLAN (files pruned), not just
  * the rows, and pins the V1 INSERT refusal as the mandatory
  * defense-in-depth tripwire behind the DSv2 doorway.
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

  /** (distinct files the scan will open, rows) — V2 BatchScanExec
    * (static: the planned FilePartitions) or V1 FileSourceScanExec
    * (executed numFiles metric), whichever the plan holds.
    */
  private def prunedScanFiles(df: DataFrame): (Long, Long) = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = df.queryExecution.executedPlan
      val v2 = plan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.toBatch.planInputPartitions().flatMap {
            case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
              fp.files.map(_.filePath.toString)
          }.distinct.length.toLong
      }
      val rows = df.collect().length.toLong
      if (v2.nonEmpty) {
        assert(v2.size == 1, s"expected one v2 scan, got ${v2.size}")
        (v2.head, rows)
      } else {
        val scans = plan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
        }
        assert(scans.size == 1, s"expected one file scan, got ${scans.size}")
        (scans.head.metrics("numFiles").value, rows)
      }
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

  test("SQL INSERT INTO lands as ONE manifest append commit — footer " +
      "stats inherited, pinned readers unaffected, no REFRESH needed — " +
      "and INSERT OVERWRITE is an atomic REPLACE") {
    val root = freshRoot()
    bars(1, 10, 0.0).write.format("graft-snapshot")
      .option("statsCols", "close").save(root)
    val before = SnapshotLake.manifest(spark, root)
    spark.sql(s"CREATE TABLE snapfmt_ins USING `graft-snapshot` " +
      s"OPTIONS (path '$root')")
    try {
      spark.sql("INSERT INTO snapfmt_ins " +
        "SELECT symbol, ts, close + 5000.0, event_id + 100 FROM snapfmt_ins")
      val after = SnapshotLake.manifest(spark, root)
      assert(after.version == before.version + 1 && after.op == "append",
        s"INSERT must land as one append commit, got v${after.version} ${after.op}")
      // the added files carry the lake's tracked footer envelopes — the
      // data-skipping index survives SQL ingest (round-12 task 8 pin)
      val added = after.files.filterNot(f =>
        before.files.map(_.rel).contains(f.rel))
      assert(added.nonEmpty && added.forall(_.stats.contains("close")),
        s"INSERT-added files must inherit close envelopes: $added")
      // rows visible IMMEDIATELY — DSv2 re-resolves the manifest per
      // statement; the V1 REFRESH TABLE footgun is gone
      assert(spark.sql("SELECT * FROM snapfmt_ins").count() == 20)
      assert(spark.sql(
        "SELECT * FROM snapfmt_ins WHERE close >= 5000.0").count() == 10)
      // pinned readers are unaffected by the commit
      assert(spark.read.format("graft-snapshot")
        .option("versionAsOf", before.version.toString).load(root)
        .count() == 10)
      // INSERT OVERWRITE = torn-free wholesale REPLACE
      spark.sql("INSERT OVERWRITE snapfmt_ins " +
        "SELECT symbol, ts, close, event_id FROM snapfmt_ins " +
        "WHERE close >= 5000.0")
      val m2 = SnapshotLake.manifest(spark, root)
      assert(m2.op == "replace" && m2.version == after.version + 1)
      assert(spark.sql("SELECT * FROM snapfmt_ins").count() == 10)
      // history intact under the replace
      assert(spark.read.format("graft-snapshot")
        .option("versionAsOf", after.version.toString).load(root)
        .count() == 20)
    } finally spark.sql("DROP TABLE snapfmt_ins")
  }

  test("V1 relation INSERT refusal stays as defense-in-depth: with the " +
      "DSv2 path disabled, INSERT INTO/OVERWRITE refuse before touching " +
      "a file (MANDATORY tripwire on dependency bumps)") {
    val root = freshRoot()
    bars(1, 10, 0.0).write.format("graft-snapshot")
      .option("statsCols", "close").save(root)
    val before = SnapshotLake.manifest(spark, root)
    // append to the DEFAULT v1 list — overwriting it would silently flip
    // parquet/csv/... to V2 for every later suite on the shared session
    val v1ListBefore = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList",
      s"$v1ListBefore,graft-snapshot")
    spark.sql(s"CREATE TABLE snapfmt_v1ins USING `graft-snapshot` " +
      s"OPTIONS (path '$root')")
    try {
      // a direct INSERT would write parquet under data/ with no manifest
      // commit (invisible rows); INSERT OVERWRITE would DELETE data files
      // a pinned manifest still references. Both must fail up front.
      intercept[Exception] {
        spark.sql("INSERT INTO snapfmt_v1ins SELECT * FROM snapfmt_v1ins")
      }
      intercept[Exception] {
        spark.sql("INSERT OVERWRITE snapfmt_v1ins SELECT * FROM snapfmt_v1ins")
      }
      val after = SnapshotLake.manifest(spark, root)
      assert(after.version == before.version &&
        after.files.map(_.rel) == before.files.map(_.rel),
        "INSERT must not have changed the lake")
      assert(SnapshotLake.read(spark, root).count() == 10)
    } finally {
      spark.sql("DROP TABLE snapfmt_v1ins")
      spark.conf.set("spark.sql.sources.useV1SourceList", v1ListBefore)
    }
  }

  test("a hive-partitioned lake is SQL-readable through the DSv2 path: " +
      "partition dirs prune through Spark's partition pruning, manifest " +
      "envelopes prune within partitions, rows match the library read") {
    val root = freshRoot()
    bars(1, 30, 0.0).write.format("graft-snapshot")
      .option("partitionCols", "symbol").option("statsCols", "close")
      .save(root)
    bars(2, 30, 1000.0).write.format("graft-snapshot")
      .mode(SaveMode.Append).option("partitionCols", "symbol")
      .option("statsCols", "close").save(root)
    val nAll = SnapshotLake.manifest(spark, root).files.size
    val df = spark.read.format("graft-snapshot").load(root)
    assert(df.schema.fieldNames.toSet ==
      Set("symbol", "ts", "close", "event_id"))
    // partition pruning: only symbol=sym0 dirs planned
    val one = df.filter(col("symbol") === "sym0")
    val (pFiles, pRows) = prunedScanFiles(one)
    assert(pRows == 20)
    assert(pFiles > 0 && pFiles < nAll,
      s"expected partition pruning: $pFiles of $nAll")
    // envelope pruning composes on top within surviving partitions
    val (bFiles, bRows) = prunedScanFiles(
      df.filter(col("symbol") === "sym0" && col("close") >= 1000.0))
    assert(bRows == 10 && bFiles < pFiles,
      s"expected envelope pruning within partitions: $bFiles of $pFiles")
    // row identity vs the library read (partition values resolved)
    val full = SnapshotLake.read(spark, root)
      .select("symbol", "ts", "close", "event_id")
    val v2 = df.select("symbol", "ts", "close", "event_id")
    assert(v2.exceptAll(full).isEmpty && full.exceptAll(v2).isEmpty)
  }

  test("CREATE TABLE with declared columns on a fresh root: the first " +
      "INSERT INTO creates the (partitioned) lake; SELECT before it " +
      "sees an empty table") {
    val root = freshRoot()
    spark.sql("CREATE TABLE snapfmt_fresh " +
      "(symbol STRING, ts TIMESTAMP_NTZ, close DOUBLE, event_id BIGINT) " +
      s"USING `graft-snapshot` PARTITIONED BY (symbol) " +
      s"OPTIONS (path '$root', statsCols 'close')")
    try {
      assert(spark.sql("SELECT * FROM snapfmt_fresh").count() == 0)
      bars(1, 12, 0.0).createOrReplaceTempView("snapfmt_fresh_src")
      spark.sql("INSERT INTO snapfmt_fresh " +
        "SELECT symbol, ts, close, event_id FROM snapfmt_fresh_src")
      val m = SnapshotLake.manifest(spark, root)
      assert(m.version == 1 && m.op == "append")
      // landed hive-partitioned per the declared transform, with stats
      assert(m.files.forall(_.rel.startsWith("symbol=")))
      assert(m.files.forall(_.stats.contains("close")))
      assert(spark.sql("SELECT * FROM snapfmt_fresh").count() == 12)
      assert(spark.sql(
        "SELECT * FROM snapfmt_fresh WHERE symbol = 'sym1'").count() == 4)
    } finally spark.sql("DROP TABLE snapfmt_fresh")
  }

  test("streaming write personality: writeStream.format lands each " +
      "micro-batch as one manifest commit with footer stats, " +
      "exactly-once across a checkpoint restart; mergeKeys selects the " +
      "upsert sink") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = freshRoot()
    val ckpt = TempDirs.create("snapfmt-ckpt")
    val ms = MemoryStream[(String, Double, Long)](spark)
    def start() = ms.toDF().toDF("symbol", "close", "event_id").writeStream
      .format("graft-snapshot")
      .option("streamId", "fmt").option("statsCols", "event_id")
      .option("checkpointLocation", ckpt)
      .start(root)
    val q = start()
    ms.addData(("a", 1.0, 1L), ("b", 2.0, 2L)); q.processAllAvailable()
    ms.addData(("c", 3.0, 3L)); q.processAllAvailable()
    q.stop()
    assert(SnapshotLake.read(spark, root).count() == 3)
    assert(SnapshotLake.lastCommittedBatch(spark, root, "fmt").contains(1L))
    assert(SnapshotLake.manifest(spark, root).files
      .forall(_.stats.contains("event_id")))
    // restart on the same checkpoint: no duplicates, ingestion continues
    val q2 = start()
    ms.addData(("d", 4.0, 4L)); q2.processAllAvailable()
    q2.stop()
    assert(SnapshotLake.read(spark, root).count() == 4)
    // and the stream-landed lake serves the SQL doorway
    assert(spark.read.format("graft-snapshot").load(root).count() == 4)

    // merge personality: keyed upsert per micro-batch, update mode
    val root2 = freshRoot()
    val ms2 = MemoryStream[(Long, String, Long)](spark)
    val q3 = ms2.toDF().toDF("id", "v", "ver").writeStream
      .format("graft-snapshot")
      .option("streamId", "cdc").option("mergeKeys", "id")
      .option("versionCol", "ver").option("pruneKey", "id")
      .outputMode("update")
      .option("checkpointLocation", TempDirs.create("snapfmt-ckpt2"))
      .start(root2)
    ms2.addData((1L, "a", 1L), (2L, "b", 1L)); q3.processAllAvailable()
    ms2.addData((1L, "a2", 2L), (3L, "c", 1L)); q3.processAllAvailable()
    q3.stop()
    val st = SnapshotLake.read(spark, root2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    // the append personality refuses non-append output modes loudly
    val e = intercept[Exception] {
      ms.toDF().toDF("symbol", "close", "event_id").writeStream
        .format("graft-snapshot").outputMode("update")
        .option("checkpointLocation", TempDirs.create("snapfmt-ckpt3"))
        .start(freshRoot())
    }
    assert(e.getMessage.contains("Append output mode"))
  }

  test("SQL DELETE FROM rewrites only envelope-overlapping files (one " +
      "atomic delete commit, untouched files survive by identity); " +
      "TRUNCATE TABLE is an atomic empty REPLACE with history intact") {
    val root = freshRoot()
    // two id-ranged appends: event_id envelopes disjoint across them
    bars(1, 20, 0.0).repartition(2).write.format("graft-snapshot")
      .option("statsCols", "event_id").save(root)
    bars(2, 20, 1000.0)
      .withColumn("event_id", col("event_id") + 1000L).repartition(2)
      .write.format("graft-snapshot").mode(SaveMode.Append)
      .option("statsCols", "event_id").save(root)
    val before = SnapshotLake.manifest(spark, root)
    val low = before.files.filter(_.stats("event_id")._2 < 1000)
    assert(low.nonEmpty && low.size < before.files.size)
    spark.sql(s"CREATE TABLE snapfmt_del USING `graft-snapshot` " +
      s"OPTIONS (path '$root')")
    try {
      // ranged delete: only the low-envelope files can contain matches
      // (bound 100 sits strictly between the two appends' envelopes —
      // the conservative box keeps boundary-touching files, so an exact
      // boundary would rewrite the first high file too)
      spark.sql("DELETE FROM snapfmt_del " +
        "WHERE event_id < 100 AND symbol = 'sym0'")
      val after = SnapshotLake.manifest(spark, root)
      assert(after.op == "delete" && after.version == before.version + 1)
      // the high-envelope files survived BY IDENTITY (same rel paths)
      val highBefore = before.files.map(_.rel).toSet -- low.map(_.rel)
      assert(highBefore.subsetOf(after.files.map(_.rel).toSet),
        "delete must not rewrite files its prune box excludes")
      assert(spark.sql("SELECT * FROM snapfmt_del").count() == 40 - 7)
      assert(spark.sql(
        "SELECT * FROM snapfmt_del WHERE symbol = 'sym0' AND event_id < 1000")
        .count() == 0)
      // TRUNCATE: atomic replace with the empty frame; history intact
      spark.sql("TRUNCATE TABLE snapfmt_del")
      assert(spark.sql("SELECT * FROM snapfmt_del").count() == 0)
      val m2 = SnapshotLake.manifest(spark, root)
      // the staged empty frame may land as one zero-row part file
      assert(m2.op == "replace" && m2.files.forall(_.rows == 0))
      assert(spark.read.format("graft-snapshot")
        .option("versionAsOf", after.version.toString).load(root)
        .count() == 33)
    } finally spark.sql("DROP TABLE snapfmt_del")
  }

  test("static-partition INSERT OVERWRITE and writeTo().overwrite(cond) " +
      "land as ONE atomic replaceWhere commit: only condition-reachable " +
      "files rewritten, stray-row frames refused") {
    val root = freshRoot()
    bars(1, 30, 0.0).write.format("graft-snapshot")
      .option("partitionCols", "symbol").option("statsCols", "event_id")
      .save(root)
    val before = SnapshotLake.manifest(spark, root)
    spark.sql(s"CREATE TABLE snapfmt_rw USING `graft-snapshot` " +
      s"OPTIONS (path '$root')")
    try {
      // static partition overwrite: ONE commit, only symbol=sym1 files
      // rewritten — the others survive by identity
      bars(2, 3, 500.0).createOrReplaceTempView("snapfmt_rw_src")
      spark.sql("INSERT OVERWRITE snapfmt_rw PARTITION (symbol='sym1') " +
        "SELECT ts, close, event_id FROM snapfmt_rw_src")
      val after = SnapshotLake.manifest(spark, root)
      assert(after.op == "replacewhere" &&
        after.version == before.version + 1)
      val othersBefore = before.files
        .filterNot(_.rel.startsWith("symbol=sym1/")).map(_.rel).toSet
      assert(othersBefore.subsetOf(after.files.map(_.rel).toSet),
        "a PARTITION (symbol='sym1') overwrite must not rewrite other partitions")
      assert(spark.sql("SELECT * FROM snapfmt_rw").count() == 30 - 10 + 3)
      assert(spark.sql(
        "SELECT * FROM snapfmt_rw WHERE symbol = 'sym1'").count() == 3)
      // filtered overwrite via DataFrameWriterV2: atomic replaceWhere
      val total = spark.sql("SELECT * FROM snapfmt_rw").count()
      val oldIn = spark.sql(
        "SELECT * FROM snapfmt_rw WHERE event_id < 5").count()
      bars(3, 5, 900.0).writeTo("snapfmt_rw")
        .overwrite(col("event_id") < 5)
      assert(spark.sql("SELECT * FROM snapfmt_rw").count() ==
        total - oldIn + 5)
      assert(spark.sql("SELECT * FROM snapfmt_rw WHERE event_id < 5")
        .collect().forall(_.getAs[Double]("close") >= 900.0))
      // a frame carrying rows the condition does NOT match is refused —
      // those rows would land OUTSIDE the overwritten region
      val v = SnapshotLake.manifest(spark, root).version
      intercept[Exception] {
        bars(4, 8, 0.0).writeTo("snapfmt_rw")
          .overwrite(col("event_id") < 3)
      }
      assert(SnapshotLake.manifest(spark, root).version == v,
        "a refused overwrite must not have committed")
    } finally spark.sql("DROP TABLE snapfmt_rw")
  }

  test("dynamic partition overwrite on a provider-path table refuses at " +
      "analysis (a catalog-table feature — the V1 save-mode contract " +
      "forbids BATCH_WRITE here)") {
    val root = freshRoot()
    bars(1, 12, 0.0).write.format("graft-snapshot")
      .option("partitionCols", "symbol").save(root)
    spark.sql(s"CREATE TABLE snapfmt_dynref USING `graft-snapshot` " +
      s"OPTIONS (path '$root')")
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      bars(2, 3, 500.0).createOrReplaceTempView("snapfmt_dynref_src")
      val e = intercept[Exception] {
        spark.sql("INSERT OVERWRITE snapfmt_dynref " +
          "SELECT symbol, ts, close, event_id FROM snapfmt_dynref_src")
      }
      assert(e.getMessage.contains("dynamic overwrite"), e.getMessage)
    } finally {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
      spark.sql("DROP TABLE snapfmt_dynref")
    }
  }

  test("writes to a version-pinned table are refused") {
    val root = freshRoot()
    bars(1, 6, 0.0).write.format("graft-snapshot").save(root)
    bars(2, 6, 10.0).write.format("graft-snapshot")
      .mode(SaveMode.Append).save(root)
    spark.sql(s"CREATE TABLE snapfmt_pin USING `graft-snapshot` " +
      s"OPTIONS (path '$root', versionAsOf '1')")
    try {
      assert(spark.sql("SELECT * FROM snapfmt_pin").count() == 6)
      val e = intercept[Exception] {
        spark.sql("INSERT INTO snapfmt_pin SELECT * FROM snapfmt_pin")
      }
      assert(e.getMessage.contains("version-pinned"))
      assert(SnapshotLake.manifest(spark, root).version == 2)
    } finally spark.sql("DROP TABLE snapfmt_pin")
  }

  test("startingVersion/endingVersion batch reads: exactly the appended " +
      "window, genesis from 1, loud refusals across rewrites and on " +
      "option conflicts, and streaming 'latest' untouched") {
    val root = freshRoot()
    SnapshotLake.append(spark, root, bars(1, 4, 0.0))   // v1
    SnapshotLake.append(spark, root, bars(2, 3, 100.0)) // v2
    SnapshotLake.append(spark, root, bars(3, 2, 200.0)) // v3
    def changes(start: String, end: Option[String]) = {
      val r = spark.read.format("graft-snapshot")
        .option("startingVersion", start)
      end.foreach(e => r.option("endingVersion", e))
      r.load(root)
    }
    // the window [2,3] is appends 2+3; [1,*] is genesis = everything
    assert(changes("2", Some("3")).count() == 5)
    assert(changes("2", Some("2")).count() == 3)
    assert(changes("1", None).count() == 9)
    assert(changes("3", None).select("close").collect()
      .map(_.getDouble(0)).forall(_ >= 200.0))
    // a post-window rewrite is invisible to a bounded window...
    SnapshotLake.compact(spark, root) // v4
    assert(changes("2", Some("3")).count() == 5)
    // ...but a window CROSSING the rewrite refuses loudly (file
    // provenance no longer equals row provenance)
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: chain(x.getCause))
    val e1 = intercept[Exception] { changes("2", None).count() }
    assert(chain(e1).exists(m => m != null && m.contains("non-append")))
    // option conflicts refuse at once
    val e2 = intercept[Exception] {
      spark.read.format("graft-snapshot").option("startingVersion", "2")
        .option("versionAsOf", "3").load(root).count()
    }
    assert(chain(e2).exists(m => m != null && m.contains("mutually")))
    intercept[Exception] {
      spark.read.format("graft-snapshot").option("endingVersion", "2")
        .load(root).count()
    }
    // a typo'd startingVersion must REFUSE, not silently fall through to
    // a full snapshot read (it would over-deliver the whole lake to a
    // CDC consumer); 'earliest' is the explicit genesis sentinel
    val e3 = intercept[Exception] {
      spark.read.format("graft-snapshot").option("startingVersion", "2x")
        .load(root).count()
    }
    assert(chain(e3).exists(m => m != null &&
      m.contains("startingVersion must be")), chain(e3).mkString("; "))
    intercept[Exception] { changes("earliest", None).count() } // crosses v4
    assert(changes("earliest", Some("3")).count() == 9)
    // the changes table refuses writes (it is a pinned window)
    changes("2", Some("3")).createOrReplaceTempView("snapfmt_chg")
    intercept[Exception] {
      spark.sql("INSERT INTO snapfmt_chg SELECT * FROM snapfmt_chg")
    }
    // the streaming personality's startingVersion=latest still works
    val q = spark.readStream.format("graft-snapshot")
      .option("startingVersion", "latest").load(root)
      .writeStream.format("memory").queryName("snapfmt_chg_stream")
      .option("checkpointLocation", TempDirs.create("snapfmt-chg-ckpt"))
      .start()
    try {
      q.processAllAvailable()
      SnapshotLake.append(spark, root, bars(4, 2, 400.0)) // v5
      q.processAllAvailable()
      assert(spark.table("snapfmt_chg_stream").count() == 2)
    } finally q.stop()
  }
}
