package graft

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._

import graft.plans.ManifestAggRewrite
import graft.sinks.{ManifestFileIndex, SnapshotLake}

/** Transparent metadata-only aggregates (graft.plans.ManifestAggRewrite):
  * a global count/min/max over a readPruned snapshot scan must collapse
  * to a LocalRelation — zero data files opened — with values identical
  * to the scan's, and every soundness gate must fall back to the scan
  * rather than answer wrong.
  */
class ManifestAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def fixture(n: Int) =
    (1 to n).map(i => (i.toLong * 7, 100.0 + i,
      ts(f"2024-03-${(i % 27) + 1}%02d 00:00:00")))
      .toDF("id", "px", "ts")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))

  private def freshLake(statsCols: Seq[String]): String = {
    val root = TempDirs.create("magg") + "/lake"
    val d = fixture(40)
    SnapshotLake.append(spark, root, d.filter($"id" % 2 === 0).repartition(2),
      statsCols = statsCols)
    SnapshotLake.append(spark, root, d.filter($"id" % 2 =!= 0).repartition(2),
      statsCols = statsCols)
    root
  }

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations = Seq(ManifestAggRewrite)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  private def isMetadataOnly(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.isInstanceOf[LocalRelation]

  test("count/min/max over readPruned collapse to a LocalRelation with " +
      "scan-identical values, long/double/timestamp domains included") {
    val root = freshLake(Seq("id", "px", "ts"))
    def agg(df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n"), min("id").as("lo_id"),
        max("id").as("hi_id"), min("px").as("lo_px"), max("px").as("hi_px"),
        min("ts").as("lo_ts"), max("ts").as("hi_ts"),
        (max("px") - min("px")).as("span")) // folded over the substituted literals
    val slow = agg(ManifestFileIndex.readPruned(spark, root)).head
    val fast = withRule {
      val df = agg(ManifestFileIndex.readPruned(spark, root))
      assert(isMetadataOnly(df), df.queryExecution.optimizedPlan.toString)
      df.head
    }
    assert(fast == slow)
  }

  test("a projection rename still resolves the underlying envelope") {
    val root = freshLake(Seq("px"))
    val (plan, got) = withRule {
      val df = ManifestFileIndex.readPruned(spark, root)
        .select(col("px").as("price"))
        .agg(min("price").as("lo"), max("price").as("hi"))
      (isMetadataOnly(df), df.head)
    }
    assert(plan)
    assert(got.getDouble(0) == 101.0 && got.getDouble(1) == 140.0)
  }

  test("soundness gates veto — filter, sum, count(col), distinct, " +
      "un-stats'd column — and the fallback scan stays correct") {
    val root = freshLake(Seq("px"))
    withRule {
      val base = ManifestFileIndex.readPruned(spark, root)
      // a Filter underneath changes the population: must read the data
      val filtered = base.filter($"px" > 110.0).agg(count(lit(1)).as("n"))
      assert(!isMetadataOnly(filtered) && filtered.head.getLong(0) == 30)
      // sum isn't derivable from envelopes
      val summed = base.agg(sum("px").as("s"))
      assert(!isMetadataOnly(summed))
      // count(col) over a NON-nullable column is count(*) — Catalyst's
      // NullPropagation proves that upstream of the rule, so it serves
      assert(isMetadataOnly(base.agg(count($"px").as("n"))))
      // distinct count
      assert(!isMetadataOnly(base.agg(countDistinct($"px").as("n"))))
      // id has no envelope here: only px was in statsCols
      assert(!isMetadataOnly(base.agg(min("id").as("lo"))))
      // …but the count-only form still rewrites on the same lake
      assert(isMetadataOnly(base.agg(count(lit(1)).as("n"))))
    }
  }

  test("empty lake answers count 0 with NULL min/max, metadata-only") {
    val root = TempDirs.create("magg-empty") + "/lake"
    SnapshotLake.append(spark, root, fixture(5).limit(0),
      statsCols = Seq("px"))
    withRule {
      val df = ManifestFileIndex.readPruned(spark, root)
        .agg(count(lit(1)).as("n"), min("px").as("lo"))
      assert(isMetadataOnly(df))
      val r = df.head
      assert(r.getLong(0) == 0L && r.isNullAt(1))
    }
  }

  test("NULLs compose like SQL MIN/MAX: footer stats ignore them; an " +
      "ALL-null file has no envelope and vetoes instead of guessing") {
    val root = TempDirs.create("magg-null") + "/lake"
    val some = Seq((1L, Some(5.0)), (2L, None), (3L, Some(9.0)))
      .toDF("id", "px")
    SnapshotLake.append(spark, root, some.repartition(1),
      statsCols = Seq("px"))
    withRule {
      val df = ManifestFileIndex.readPruned(spark, root)
        .agg(min("px").as("lo"), max("px").as("hi"))
      assert(isMetadataOnly(df))
      assert(df.head == org.apache.spark.sql.Row(5.0, 9.0))
      // count(NULLABLE col) must scan: the manifest carries no null counts
      val cnt = ManifestFileIndex.readPruned(spark, root)
        .agg(count($"px").as("n"))
      assert(!isMetadataOnly(cnt) && cnt.head.getLong(0) == 2L)
    }
    val allNull = Seq((4L, Option.empty[Double])).toDF("id", "px")
    SnapshotLake.append(spark, root, allNull.repartition(1),
      statsCols = Seq("px"))
    withRule {
      val df = ManifestFileIndex.readPruned(spark, root)
        .agg(min("px").as("lo"))
      assert(!isMetadataOnly(df)) // the new file carries no px envelope
      assert(df.head.getDouble(0) == 5.0)
    }
  }

  test("floating-point ±0.0 bound vetoes min/max (parquet-mr widens zero " +
      "bounds across the sign); counts still serve") {
    val root = TempDirs.create("magg-zero") + "/lake"
    SnapshotLake.append(spark, root,
      Seq((1L, 0.0), (2L, 3.0)).toDF("id", "px").repartition(1),
      statsCols = Seq("px"))
    withRule {
      val base = ManifestFileIndex.readPruned(spark, root)
      val mm = base.agg(min("px").as("lo"))
      assert(!isMetadataOnly(mm) && mm.head.getDouble(0) == 0.0)
      assert(isMetadataOnly(base.agg(count(lit(1)).as("n"))))
    }
  }

  test("legacy pre-rows manifest vetoes: no exact counts, fall back") {
    val root = freshLake(Seq("px"))
    // strip stats+rows columns from the head manifest (2-col legacy lines)
    val fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mPath = new Path(new Path(root, "_manifests"), "v00000002.manifest")
    val in = fs.open(mPath)
    val raw = scala.io.Source.fromInputStream(in).mkString; in.close()
    val legacy = raw.split("\n").map { l =>
      val c = l.split('\t'); if (c.length >= 3) s"${c(0)}\t${c(1)}" else l
    }.mkString("\n")
    val o = fs.create(mPath, true); o.write(legacy.getBytes); o.close()
    SnapshotLake.invalidateManifestCache(root) // rewrote a published manifest
    withRule {
      val df = ManifestFileIndex.readPruned(spark, root)
        .agg(count(lit(1)).as("n"))
      assert(!isMetadataOnly(df) && df.head.getLong(0) == 40L)
    }
  }
}
