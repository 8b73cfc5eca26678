package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.sinks.SnapshotLake

/** The snapshot lake as a streaming source: manifest versions are
  * offsets, appends become micro-batches, checkpoint restart resumes
  * exactly where the consumer stopped, and rewrite commits either fail
  * loudly (strict default) or are skipped (`skipRewrites`, Delta's
  * skipChangeCommits semantics).
  */
class SnapshotSourceSpec extends SparkSpec {
  import spark.implicits._

  private def rows(lo: Int, hi: Int) =
    (lo to hi).map(i => (i.toLong, s"d-$i")).toDF("id", "s")

  private val Fmt = "graft.streaming.SnapshotSourceProvider"

  test("earliest: first batch is the full snapshot, appends arrive as " +
      "increments, checkpoint restart resumes exactly-once") {
    val work = TempDirs.create("snapsrc")
    val root = s"$work/lake"; val dst = s"$work/dst"
    SnapshotLake.append(spark, root, rows(1, 10))
    SnapshotLake.append(spark, root, rows(11, 15))
    val ckpt = s"$work/ckpt"
    // memory sinks refuse checkpoint recovery; the lake sink IS the
    // recoverable end of this pipeline, so mirror into a second lake
    def start() = spark.readStream.format(Fmt).load(root)
      .writeStream
      .foreachBatch(SnapshotLake.appendStream(dst, streamId = "t1"))
      .option("checkpointLocation", ckpt).start()
    val q = start()
    try {
      q.processAllAvailable()
      // initial snapshot = full state at head (both appends)
      assert(SnapshotLake.read(spark, dst).count() == 15)
      // an append while running arrives as one increment
      SnapshotLake.append(spark, root, rows(16, 18))
      q.processAllAvailable()
      assert(SnapshotLake.read(spark, dst).count() == 18)
    } finally q.stop()
    // offline appends + restart from checkpoint: ONLY the new rows land —
    // 20 distinct ids total, no initial-snapshot re-delivery, no dups
    SnapshotLake.append(spark, root, rows(19, 20))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = SnapshotLake.read(spark, dst).select("id").as[Long]
        .collect().sorted
      assert(got.toSeq == (1 to 20).map(_.toLong))
    } finally q2.stop()
  }

  test("latest: history is skipped, only post-start appends stream") {
    val work = TempDirs.create("snapsrc2")
    val root = s"$work/lake"
    SnapshotLake.append(spark, root, rows(1, 100))
    val q = spark.readStream.format(Fmt)
      .option("startingVersion", "latest").load(root)
      .writeStream.format("memory").queryName("snap_latest_out")
      .option("checkpointLocation", s"$work/ckpt").start()
    try {
      q.processAllAvailable()
      assert(spark.table("snap_latest_out").count() == 0)
      SnapshotLake.append(spark, root, rows(101, 103))
      q.processAllAvailable()
      assert(spark.table("snap_latest_out").select("id").as[Long]
        .collect().sorted.toSeq == Seq(101L, 102L, 103L))
    } finally q.stop()
  }

  test("strict mode fails loudly on a rewrite commit; skipRewrites " +
      "passes it over and keeps tailing appends") {
    val work = TempDirs.create("snapsrc3")
    val root = s"$work/lake"
    SnapshotLake.append(spark, root, rows(1, 10))
    val strict = spark.readStream.format(Fmt)
      .option("startingVersion", "latest").load(root)
      .writeStream.format("memory").queryName("snap_strict_out")
      .option("checkpointLocation", s"$work/ckpt1").start()
    try {
      strict.processAllAvailable()
      SnapshotLake.append(spark, root, rows(11, 12))
      SnapshotLake.compact(spark, root, targetBytes = 1L << 30)
      SnapshotLake.append(spark, root, rows(13, 14))
      val e = intercept[StreamingQueryException] {
        strict.processAllAvailable()
      }
      assert(e.getCause.getMessage.contains("compact"))
    } finally strict.stop()
    // same lake, same shape, skipRewrites: appends flow, compact ignored
    val skip = spark.readStream.format(Fmt)
      .option("startingVersion", "latest").option("skipRewrites", "true")
      .load(root)
      .writeStream.format("memory").queryName("snap_skip_out")
      .option("checkpointLocation", s"$work/ckpt2").start()
    try {
      SnapshotLake.append(spark, root, rows(15, 16))
      SnapshotLake.delete(spark, root, col("id") <= 2)
      SnapshotLake.append(spark, root, rows(17, 17))
      skip.processAllAvailable()
      // only the appends since this consumer started; the delete's
      // rewritten rows never re-emit
      assert(spark.table("snap_skip_out").select("id").as[Long]
        .collect().sorted.toSeq == Seq(15L, 16L, 17L))
    } finally skip.stop()
  }

  test("skipRewrites window crossing a field-id migration: pre-migration " +
      "appends read via the name mapping (id-resolution reads on), " +
      "post-migration appends by id — one emitted batch, both correct") {
    val work = TempDirs.create("snapsrc-mig")
    val root = s"$work/lake"
    // legacy (id-less) lake: replace-born
    SnapshotLake.replace(spark, root, rows(1, 2), statsCols = Seq("id"))
    val prevRead = spark.conf
      .getOption("spark.sql.parquet.fieldId.read.enabled")
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val q = spark.readStream.format(Fmt)
      .option("startingVersion", "latest").option("skipRewrites", "true")
      .load(root)
      .writeStream.format("memory").queryName("snap_mig_out")
      .option("checkpointLocation", s"$work/ckpt").start()
    try {
      q.processAllAvailable()
      SnapshotLake.append(spark, root, rows(3, 4)) // v2: id-less files
      SnapshotLake.upgradeFieldIds(spark, root) // v3: metadata-only
      SnapshotLake.append(spark, root, rows(5, 6)) // v4: id-carrying
      q.processAllAvailable() // ONE window (v1, v4] spanning the migration
      assert(spark.table("snap_mig_out").select("id", "s").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap ==
        Map(3L -> "d-3", 4L -> "d-4", 5L -> "d-5", 6L -> "d-6"),
        "both file generations must read correctly across the migration")
    } finally {
      q.stop()
      prevRead match {
        case Some(v) =>
          spark.conf.set("spark.sql.parquet.fieldId.read.enabled", v)
        case None =>
          spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
      }
    }
  }

  test("lake-to-lake pipeline: source tail + appendStream sink compose " +
      "into an exactly-once mirror with a transform in between") {
    val work = TempDirs.create("snapsrc4")
    val src = s"$work/src"; val dst = s"$work/dst"
    SnapshotLake.append(spark, src, rows(1, 50))
    val q = spark.readStream.format(Fmt).load(src)
      .withColumn("id2", col("id") * 2)
      .writeStream
      .foreachBatch(SnapshotLake.appendStream(dst, streamId = "mirror"))
      .option("checkpointLocation", s"$work/ckpt").start()
    try {
      q.processAllAvailable()
      SnapshotLake.append(spark, src, rows(51, 60))
      q.processAllAvailable()
      val out = SnapshotLake.read(spark, dst)
      assert(out.count() == 60)
      assert(out.filter(col("id2") =!= col("id") * 2).isEmpty)
      // replayed batch ids are skipped at the sink (exactly-once even if
      // the handler re-fires): simulate by re-invoking batch 0's handler
      val dup = SnapshotLake.read(spark, src, Some(1L)).withColumn("id2",
        col("id") * 2)
      SnapshotLake.appendStream(dst, streamId = "mirror")(dup, 0L)
      assert(SnapshotLake.read(spark, dst).count() == 60)
    } finally q.stop()
  }

  test("streaming from an empty path or with a user schema refuses " +
      "loudly") {
    val work = TempDirs.create("snapsrc5")
    val e = intercept[Exception] {
      spark.readStream.format(Fmt).load(s"$work/nope")
        .writeStream.format("memory").queryName("snap_err_out")
        .option("checkpointLocation", s"$work/ckpt").start()
        .processAllAvailable()
    }
    assert(e.getMessage.contains("no committed snapshot") ||
      Option(e.getCause).exists(_.getMessage.contains("no committed snapshot")))
  }

  private def kvv(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("id", "s", "ver")

  test("readChangeFeed: merges classify as updates/inserts, deletes as " +
      "deletes with their last values, a compact emits ZERO change rows, " +
      "and a multi-commit trigger range replays the FULL per-version " +
      "history") {
    val work = TempDirs.create("snapcdc")
    val root = s"$work/lake"
    SnapshotLake.append(spark, root,
      kvv((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)),
      statsCols = Seq("id"))
    val q = spark.readStream.format(Fmt)
      .option("readChangeFeed", "true").option("keyCols", "id")
      .load(root)
      .writeStream.format("memory").queryName("cdc_feed")
      .option("checkpointLocation", s"$work/ckpt").start()
    try {
      q.processAllAvailable()
      def feed() = spark.table("cdc_feed")
        .select("_change_type", "id", "s", "ver", "_commit_version")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4))).toSet
      // initial snapshot: every live row as an insert at the head version
      assert(feed() == Set(("insert", 1L, "a", 1L, 1L),
        ("insert", 2L, "b", 1L, 1L), ("insert", 3L, "c", 1L, 1L)))
      // TWO merges land before the next trigger: the range replays the
      // full history — two update rows for key 2, distinct versions
      SnapshotLake.merge(spark, root, kvv((2L, "b2", 2L), (4L, "d", 2L)),
        keyCols = Seq("id"), versionCol = "ver", pruneKey = "id")
      SnapshotLake.merge(spark, root, kvv((2L, "b3", 3L)),
        keyCols = Seq("id"), versionCol = "ver", pruneKey = "id")
      q.processAllAvailable()
      assert(feed() == Set(("insert", 1L, "a", 1L, 1L),
        ("insert", 2L, "b", 1L, 1L), ("insert", 3L, "c", 1L, 1L),
        ("update", 2L, "b2", 2L, 2L), ("insert", 4L, "d", 2L, 2L),
        ("update", 2L, "b3", 3L, 3L)))
      // a delete emits the row's LAST values
      SnapshotLake.delete(spark, root, col("id") === 3L,
        pruneBox = Map("id" -> (3.0, 3.0)))
      q.processAllAvailable()
      assert(feed().contains(("delete", 3L, "c", 1L, 4L)))
      val before = feed()
      // maintenance is invisible: compaction rewrites every file into
      // the same rows — zero change rows
      SnapshotLake.compact(spark, root)
      q.processAllAvailable()
      assert(feed() == before, "a compact must emit no change rows")
    } finally q.stop()
    // skipRewrites + readChangeFeed refuse together
    val e = intercept[Exception] {
      spark.readStream.format(Fmt)
        .option("readChangeFeed", "true").option("keyCols", "id")
        .option("skipRewrites", "true").load(root)
        .writeStream.format("memory").queryName("cdc_bad")
        .option("checkpointLocation", s"$work/ckpt2").start()
        .processAllAvailable()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    assert(msgs(e).exists(_.contains("mutually exclusive")))
  }

  test("readChangeFeed mirror: a keyed lake maintained from the change " +
      "feed (merge upserts on _commit_version, delete deletes) matches " +
      "the source bit-exactly, across restart replay") {
    val work = TempDirs.create("snapcdc2")
    val root = s"$work/lake"; val dst = s"$work/mirror"
    val ckpt = s"$work/ckpt"
    SnapshotLake.append(spark, root,
      kvv((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)),
      statsCols = Seq("id"))
    // the CDC-consumer shape: upserts via merge keyed on _commit_version
    // (idempotent under foreachBatch's at-least-once replays — a
    // re-merge at the same version is keep-latest no-op), deletes via a
    // key-set delete (idempotent by construction)
    def applyChanges(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      val s = df.sparkSession
      val dels = df.filter(col("_change_type") === "delete")
        .select("id").collect().map(_.getLong(0))
      val ups = df.filter(col("_change_type") =!= "delete")
        .select(col("id"), col("s"), col("_commit_version").as("ver"))
      if (SnapshotLake.latestVersion(s, dst).isEmpty)
        SnapshotLake.append(s, dst, ups.limit(0), statsCols = Seq("id"))
      if (!ups.isEmpty)
        SnapshotLake.merge(s, dst, ups, keyCols = Seq("id"),
          versionCol = "ver", pruneKey = "id")
      if (dels.nonEmpty)
        SnapshotLake.delete(s, dst, col("id").isin(dels.toIndexedSeq: _*),
          pruneBox = Map("id" -> (dels.min.toDouble, dels.max.toDouble)))
    }
    def start() = spark.readStream.format(Fmt)
      .option("readChangeFeed", "true").option("keyCols", "id")
      .load(root)
      .writeStream.foreachBatch(applyChanges _)
      .option("checkpointLocation", ckpt).start()
    def srcState() = SnapshotLake.read(spark, root)
      .select("id", "s").collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap
    def dstState() = SnapshotLake.read(spark, dst)
      .select("id", "s").collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap
    val q = start()
    try {
      q.processAllAvailable()
      assert(dstState() == srcState())
      SnapshotLake.merge(spark, root, kvv((2L, "b2", 2L), (4L, "d", 2L)),
        keyCols = Seq("id"), versionCol = "ver", pruneKey = "id")
      q.processAllAvailable()
      assert(dstState() == srcState())
      SnapshotLake.delete(spark, root, col("id") === 1L,
        pruneBox = Map("id" -> (1.0, 1.0)))
      q.processAllAvailable()
      assert(dstState() == srcState())
      assert(!dstState().contains(1L))
    } finally q.stop()
    // offline changes + restart from checkpoint: only the new versions
    // replay — the mirror converges with no initial-snapshot re-delivery
    SnapshotLake.merge(spark, root, kvv((4L, "d2", 3L), (5L, "e", 3L)),
      keyCols = Seq("id"), versionCol = "ver", pruneKey = "id")
    SnapshotLake.compact(spark, root)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(dstState() == srcState())
      assert(dstState()(4L) == "d2" && dstState()(5L) == "e")
    } finally q2.stop()
  }
}
