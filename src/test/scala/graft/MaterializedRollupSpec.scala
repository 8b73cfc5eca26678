package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.{MaterializedRollup => MV, SnapshotLake}

/** Incrementally-maintained rollup over a snapshot lake: associative state,
  * manifest-provenance deltas, file-pruned combines, broken-chain fallback.
  */
class MaterializedRollupSpec extends SparkSpec {
  import spark.implicits._

  // (symbol, ts) unique by construction: one row per minute per symbol,
  // spread over `month`, so arg-extremes are deterministic.
  private def bars(month: Int, n: Int, tag: Double): DataFrame =
    (0 until n).map { i =>
      val t = Timestamp.valueOf(
        f"2024-$month%02d-10 ${(i / 60) % 24}%02d:${i % 60}%02d:00")
      (s"sym${i % 3}", t, tag + i, 1.0 + (i % 7))
    }.toDF("symbol", "ts", "close", "volume")
      // NTZ is the engine's canonical ts type (Tables canonicalizes all
      // sources to it) AND the prunable one: LTZ writes as INT96, which
      // parquet gives no footer min/max, so an LTZ pruneKey would make
      // every refresh conservatively rewrite the whole MV.
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      // date_trunc coerces NTZ -> LTZ; cast back (identity under the
      // pinned UTC session) so the prune key stays INT64-prunable
      .withColumn("bucket_ts",
        date_trunc("hour", col("ts")).cast("timestamp_ntz"))

  private val spec = MV.Spec(
    keyCols = Seq("symbol", "bucket_ts"), pruneKey = "bucket_ts",
    sumCols = Seq("volume"), minCols = Seq("close"), maxCols = Seq("close"),
    orderCol = Some("ts"), firstCols = Seq("close"), lastCols = Seq("close"),
    targetRowsPerFile = 4L) // tiny so the range clustering yields real files

  private def roots(): (String, String) = {
    val w = TempDirs.create("mvroll")
    (w + "/base", w + "/mv")
  }

  private def assertMatchesFull(base: String, mv: String): Unit = {
    val full = MV.finals(MV.lift(SnapshotLake.read(spark, base), spec), spec)
    val inc = MV.readFinal(spark, mv, spec)
    assert(inc.except(full).isEmpty && full.except(inc).isEmpty,
      "incremental state diverged from the full recompute")
  }

  test("incremental refresh equals the full recompute exactly, " +
      "across three append slices") {
    val (base, mv) = roots()
    SnapshotLake.append(spark, base, bars(1, 200, 100.0),
      statsCols = Seq("bucket_ts"))
    val r0 = MV.init(spark, base, mv, spec)
    assert(r0.baseVersion == 1L)
    SnapshotLake.append(spark, base, bars(2, 150, 500.0),
      statsCols = Seq("bucket_ts"))
    val r1 = MV.refresh(spark, base, mv, spec)
    assert(r1.baseVersion == 2L && r1.deltaRows == 150L)
    SnapshotLake.append(spark, base, bars(3, 75, 900.0),
      statsCols = Seq("bucket_ts"))
    val r2 = MV.refresh(spark, base, mv, spec)
    assert(r2.baseVersion == 3L && r2.deltaRows == 75L)
    assertMatchesFull(base, mv)
    // overlapping-key correctness: re-append MORE rows into month 1's
    // buckets (distinct minutes via the tag offset only — same buckets,
    // same keys) and verify the combine folds them into existing state
    SnapshotLake.append(spark, base, bars(1, 200, 7777.0)
      .withColumn("ts", (col("ts") + expr("INTERVAL 30 SECOND"))
        .cast("timestamp_ntz"))
      .withColumn("bucket_ts",
        date_trunc("hour", col("ts")).cast("timestamp_ntz")),
      statsCols = Seq("bucket_ts"))
    MV.refresh(spark, base, mv, spec)
    assertMatchesFull(base, mv)
  }

  test("refresh prunes: a time-local delta leaves non-overlapping " +
      "aggregate files untouched, by identity") {
    val (base, mv) = roots()
    SnapshotLake.append(spark, base, bars(1, 300, 0.0),
      statsCols = Seq("bucket_ts"))
    MV.init(spark, base, mv, spec)
    val before = SnapshotLake.manifest(spark, mv, None)
    SnapshotLake.append(spark, base, bars(6, 60, 50.0),
      statsCols = Seq("bucket_ts"))
    val r = MV.refresh(spark, base, mv, spec)
    assert(r.filesUntouched > 0,
      s"expected pruning, got untouched=${r.filesUntouched} " +
        s"combined=${r.filesCombined}")
    val after = SnapshotLake.manifest(spark, mv, None)
    val kept = before.files.map(_.rel).toSet
      .intersect(after.files.map(_.rel).toSet)
    assert(kept.size == r.filesUntouched,
      "untouched files must survive by identity in the new manifest")
    assertMatchesFull(base, mv)
  }

  test("distinct (HLL) state: incremental register folds across slices == " +
      "one-shot approxDistinct bit-for-bit; replayed fold converges; " +
      "non-canonical distinct type refused") {
    val (base, mv) = roots()
    def withUid(df: DataFrame) =
      df.withColumn("uid", (col("close") % 13).cast("long"))
    val dspec = spec.copy(distinctCols = Seq("uid"), hllP = 8)
    SnapshotLake.append(spark, base, withUid(bars(1, 200, 100.0)),
      statsCols = Seq("bucket_ts"))
    MV.init(spark, base, mv, dspec)
    SnapshotLake.append(spark, base, withUid(bars(2, 150, 500.0)),
      statsCols = Seq("bucket_ts"))
    MV.refresh(spark, base, mv, dspec)
    SnapshotLake.append(spark, base, withUid(bars(1, 100, 250.0)),
      statsCols = Seq("bucket_ts")) // overlaps slice 1's buckets
    MV.refresh(spark, base, mv, dspec)
    MV.refresh(spark, base, mv, dspec) // no-op replay: must not change state
    val got = MV.readFinal(spark, mv, dspec)
      .select("symbol", "bucket_ts", "approx_distinct_uid")
    val oneShot = graft.operators.Hll.approxDistinct(
      withUid(SnapshotLake.read(spark, base)),
      Seq("symbol", "bucket_ts"), col("uid"), p = 8)
      .withColumnRenamed("approx_distinct", "approx_distinct_uid")
    assert(got.except(oneShot).isEmpty && oneShot.except(got).isEmpty,
      "incremental distinct state diverged from the one-shot sketch")
    // every group has a non-null estimate (uid never null here)
    assert(got.filter(col("approx_distinct_uid").isNull).count() == 0)
    // refusal: a double distinct column has no canonical string form
    val e = intercept[IllegalArgumentException] {
      MV.init(spark, base, TempDirs.create("mvbad") + "/mv",
        spec.copy(distinctCols = Seq("close")), replace = false)
    }
    assert(e.getMessage.contains("canonical"))
  }

  test("no-op refresh publishes nothing; zero-row append bumps only the " +
      "anchor; init-over-existing refuses without replace") {
    val (base, mv) = roots()
    SnapshotLake.append(spark, base, bars(1, 50, 0.0),
      statsCols = Seq("bucket_ts"))
    val r0 = MV.init(spark, base, mv, spec)
    val noop = MV.refresh(spark, base, mv, spec)
    assert(noop.mvVersion == r0.mvVersion && noop.deltaRows == 0L)
    // zero-row append: the anchor must advance (else every refresh
    // re-walks the empty version) but the files must be untouched
    SnapshotLake.append(spark, base, bars(1, 50, 0.0).limit(0),
      statsCols = Seq("bucket_ts"))
    val z = MV.refresh(spark, base, mv, spec)
    assert(z.baseVersion == 2L && z.deltaRows == 0L)
    assert(MV.lastRefreshedBase(spark, mv).contains(2L))
    val m = SnapshotLake.manifest(spark, mv, None)
    assert(m.version > r0.mvVersion &&
      m.files.map(_.rel).toSet ==
        SnapshotLake.manifest(spark, mv, Some(r0.mvVersion)).files.map(_.rel).toSet)
    val e = intercept[IllegalArgumentException] {
      MV.init(spark, base, mv, spec)
    }
    assert(e.getMessage.contains("replace"))
    assertMatchesFull(base, mv)
  }

  test("base compaction breaks the incremental chain loudly; fullRefresh " +
      "re-anchors and incremental resumes") {
    val (base, mv) = roots()
    SnapshotLake.append(spark, base, bars(1, 100, 0.0),
      statsCols = Seq("bucket_ts"))
    MV.init(spark, base, mv, spec)
    SnapshotLake.append(spark, base, bars(2, 100, 10.0),
      statsCols = Seq("bucket_ts"))
    SnapshotLake.compact(spark, base)
    val e = intercept[IllegalStateException] {
      MV.refresh(spark, base, mv, spec)
    }
    assert(e.getMessage.contains("fullRefresh"))
    MV.fullRefresh(spark, base, mv, spec)
    assertMatchesFull(base, mv)
    // chain re-anchored at the compacted head: appends flow again
    SnapshotLake.append(spark, base, bars(3, 40, 20.0),
      statsCols = Seq("bucket_ts"))
    val r = MV.refresh(spark, base, mv, spec)
    assert(r.deltaRows == 40L)
    assertMatchesFull(base, mv)
  }

  test("racing refreshers never double-count: one wins, the loser no-ops " +
      "or aborts on the anchor guard, and the state stays exact") {
    val (base, mv) = roots()
    SnapshotLake.append(spark, base, bars(1, 80, 0.0),
      statsCols = Seq("bucket_ts"))
    MV.init(spark, base, mv, spec)
    SnapshotLake.append(spark, base, bars(2, 80, 10.0),
      statsCols = Seq("bucket_ts"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val outcomes = Await.result(Future.sequence((1 to 2).map(_ => Future {
      try { MV.refresh(spark, base, mv, spec); "ok" }
      catch {
        case e: Exception
            if e.getMessage != null && e.getMessage.contains("concurrent refresh") =>
          "aborted"
      }
    })), 120.seconds)
    assert(outcomes.contains("ok"))
    assert(MV.lastRefreshedBase(spark, mv).contains(2L))
    assertMatchesFull(base, mv)
  }
}
