package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sinks.Lake

/** Partition-pruned lake MERGE: upsert semantics + proof that untouched
  * partition directories are not rewritten.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val base = Seq(
    // three months, two symbols, version = v
    ("btc", ts("2024-01-10 00:00:00"), 100.0, 1L),
    ("btc", ts("2024-02-10 00:00:00"), 200.0, 1L),
    ("eth", ts("2024-02-11 00:00:00"), 210.0, 1L),
    ("btc", ts("2024-03-10 00:00:00"), 300.0, 1L)
  ).toDF("symbol", "ts", "close", "v")

  test("merge rewrites touched partitions only, keep-latest wins") {
    val dir = java.nio.file.Files.createTempDirectory("merge").toString + "/lake"
    Lake.writeArchive(base, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partFiles(p: String): Map[String, Long] = {
      val d = new org.apache.hadoop.fs.Path(s"$dir/$p")
      fs.listStatus(d).filter(_.isFile).filter(!_.getPath.getName.startsWith("_"))
        .map(f => f.getPath.getName -> f.getModificationTime).toMap
    }
    val janBefore = partFiles("year=2024/month=1")
    val marBefore = partFiles("year=2024/month=3")

    val updates = Seq(
      ("btc", ts("2024-02-10 00:00:00"), 250.0, 2L), // update (higher v)
      ("eth", ts("2024-02-11 00:00:00"), 205.0, 0L), // stale (lower v) — loses
      ("eth", ts("2024-02-12 00:00:00"), 215.0, 1L), // insert into feb
      ("btc", ts("2024-04-01 00:00:00"), 400.0, 1L)  // brand-new partition
    ).toDF("symbol", "ts", "close", "v")
    val (touched, written) = Lake.mergeArchive(spark, dir, updates,
      keyCols = Seq("symbol", "ts"), versionCol = "v")
    assert(touched == Seq((2024, 2), (2024, 4)))
    // feb: btc@250 (v2 wins), eth 2-11@210 (v1 kept over stale v0),
    // eth 2-12@215 (insert) = 3; apr: 1 → 4 rows rewritten
    assert(written == 4)
    val after = spark.read.parquet(dir)
    assert(after.count() == 6) // jan 1 + feb 3 + mar 1 + apr 1
    val feb = after.filter(col("month") === 2)
      .select("symbol", "close", "v").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(feb == Set(("btc", 250.0, 2L), ("eth", 210.0, 1L), ("eth", 215.0, 1L)))
    // untouched partitions: identical files, identical mtimes
    assert(partFiles("year=2024/month=1") == janBefore)
    assert(partFiles("year=2024/month=3") == marBefore)
    // staging dir cleaned up
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .exists(_.getPath.getName.startsWith(".merge_staging")))
  }

  test("compactPartitions folds many small files into few, rows identical") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/lake"
    // simulate streaming ingest: 12 tiny appends into one partition
    (0 until 12).foreach { i =>
      base.filter(col("symbol") === "btc" && month(col("ts")) === 2)
        .withColumn("close", col("close") + i)
        .withColumn("v", lit(i.toLong))
        .withColumn("ts", col("ts") + expr(s"INTERVAL $i MINUTES"))
        .withColumn("year", year(col("ts"))).withColumn("month", month(col("ts")))
        .write.mode("append").partitionBy("year", "month").parquet(dir)
    }
    val before = spark.read.parquet(dir)
    val rows = before.collect().map(_.toString).sorted
    val report = Lake.compactPartitions(spark, dir, Seq((2024, 2)))
    assert(report.length == 1)
    val (p, nb, na) = report.head
    assert(p == "year=2024/month=2" && nb == 12 && na == 1)
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(after.sameElements(rows))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/year=2024"))
      .map(_.getPath.getName).filter(_.startsWith(".compact"))
    assert(leftovers.isEmpty)
  }

  test("reader racing a compaction swap: stale plan fails loudly, re-plan wins") {
    val dir = java.nio.file.Files.createTempDirectory("race").toString + "/lake"
    (0 until 6).foreach { i =>
      base.filter(col("symbol") === "btc" && month(col("ts")) === 2)
        .withColumn("ts", col("ts") + expr(s"INTERVAL $i MINUTES"))
        .withColumn("year", year(col("ts"))).withColumn("month", month(col("ts")))
        .write.mode("append").partitionBy("year", "month").parquet(dir)
    }
    val expected = spark.read.parquet(dir).collect().map(_.toString).sorted
    // reader resolves its file list BEFORE the swap...
    val stale = spark.read.parquet(dir)
    assert(stale.inputFiles.length >= 6)
    // ...maintenance swaps the partition underneath it...
    Lake.compactPartitions(spark, dir, Seq((2024, 2)))
    // ...execution of the pre-swap plan must fail LOUDLY (FileNotFound
    // somewhere in the task-failure chain), never silently drop rows
    val e = intercept[Throwable] { stale.collect() }
    assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .exists(_.isInstanceOf[java.io.FileNotFoundException]),
      s"expected FileNotFoundException in the cause chain, got: $e")
    // the documented recovery: re-plan via retryingOnSwap (fresh read
    // per attempt) — identical rows, no loss
    val again = Lake.retryingOnSwap() {
      // first attempt may still consult a cached FileIndex — the helper
      // retries with a brand-new read, which re-lists
      spark.read.parquet(dir).collect().map(_.toString).sorted
    }
    assert(again.sameElements(expected),
      "post-swap re-plan lost or changed rows")
  }

  test("equal-version batch duplicates resolve identically across runs") {
    // two batch rows share (symbol, ts) AND v — the winner must be the
    // same row every time (whole-row hash tie-break), not whichever task
    // finished first
    val dup = Seq(
      ("btc", ts("2024-05-01 00:00:00"), 111.0, 5L),
      ("btc", ts("2024-05-01 00:00:00"), 999.0, 5L)
    ).toDF("symbol", "ts", "close", "v")
    val picks = (1 to 3).map { _ =>
      val dir = java.nio.file.Files.createTempDirectory("merge").toString + "/lake"
      Lake.writeArchive(base, dir)
      Lake.mergeArchive(spark, dir, dup, Seq("symbol", "ts"), "v")
      spark.read.parquet(dir).filter(col("month") === 5)
        .select("close").collect().map(_.getDouble(0)).toSeq
    }
    assert(picks.forall(_.length == 1))
    assert(picks.distinct.size == 1, s"nondeterministic winners: $picks")
  }

  test("empty update batch is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("merge").toString + "/lake"
    Lake.writeArchive(base, dir)
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted
    val (touched, written) = Lake.mergeArchive(spark, dir,
      base.filter(col("v") < 0), keyCols = Seq("symbol", "ts"), versionCol = "v")
    assert(touched.isEmpty && written == 0)
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(after.sameElements(before))
  }
}
