package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sinks.SnapshotLake

/** Maintenance policy surface (round 16): `advise` reads the manifest —
  * zero data I/O — and recommends the CALL that fixes each degraded
  * dimension; `mergeStreamComposite(autoCompactSidecars = N)` is the
  * in-stream policy that keeps a merge-on-read mirror's read tax
  * bounded without an operator in the loop.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse =
    spark.conf.getOption("spark.sql.catalog.graft.warehouse").getOrElse {
      val wh = TempDirs.create("graft-maint-wh")
      spark.conf.set("spark.sql.catalog.graft", "graft.sinks.GraftCatalog")
      spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
      wh
    }

  private def kv(rows: (Long, String, Long)*): DataFrame =
    rows.toSeq.toDF("id", "v", "ver")

  private val kvSchema = StructType(Seq(StructField("id", LongType),
    StructField("v", StringType), StructField("ver", LongType)))

  test("advise: a healthy lake returns nothing; degraded dimensions each " +
      "surface with the fixing CALL — and the SQL doorway serves the " +
      "same rows") {
    // healthy: one well-sized append, no deletes, no declared blooms
    val healthy = s"${TempDirs.create("adv-ok")}/lake"
    SnapshotLake.append(spark, healthy, kv((1L, "a", 1L)),
      statsCols = Seq("id"))
    assert(SnapshotLake.advise(spark, healthy).isEmpty)

    // pending-delete tax: a mor lake with a stacked sidecar
    val mor = s"${TempDirs.create("adv-mor")}/lake"
    SnapshotLake.create(spark, mor, kvSchema,
      tableProps = Map("dmlMode" -> "mor", "statsCols" -> "id"))
    SnapshotLake.append(spark, mor,
      kv((1L, "a", 1L), (2L, "b", 1L)).coalesce(1), statsCols = Seq("id"))
    (2 to 5).foreach { i =>
      SnapshotLake.merge(spark, mor, kv((1L, s"a$i", i.toLong)),
        keyCols = Seq("id"), versionCol = "ver", pruneKey = "id")
    }
    val morAdv = SnapshotLake.advise(spark, mor)
    val pend = morAdv.find(_.kind == "pending-deletes")
    assert(pend.nonEmpty, morAdv.mkString("; "))
    assert(pend.get.severity == "recommend" || pend.get.severity == "urgent")
    assert(pend.get.action.contains("optimize"))
    // compact clears the advice
    SnapshotLake.compact(spark, mor)
    assert(!SnapshotLake.advise(spark, mor).exists(_.kind == "pending-deletes"))

    // small files: 20 tiny appends
    val small = s"${TempDirs.create("adv-small")}/lake"
    (1 to 20).foreach(i => SnapshotLake.append(spark, small,
      kv((i.toLong, s"v$i", 1L)).coalesce(1)))
    val sm = SnapshotLake.advise(spark, small).find(_.kind == "small-files")
    assert(sm.nonEmpty)
    assert(sm.get.metric.contains("20/20"))

    // clustering drift: zorder then pour unclustered appends over it
    val drift = s"${TempDirs.create("adv-drift")}/lake"
    SnapshotLake.append(spark, drift,
      (1L to 400L).map(i => (i, s"v$i", 1L)).toDF("id", "v", "ver")
        .repartition(4), statsCols = Seq("id"))
    SnapshotLake.optimizeZOrder(spark, drift, Seq("id", "ver"))
    assert(!SnapshotLake.advise(spark, drift)
      .exists(_.kind == "clustering-drift"))
    (1 to 3).foreach(i => SnapshotLake.append(spark, drift,
      kv((1000L + i, s"n$i", 1L)).coalesce(1), statsCols = Seq("id")))
    val dr = SnapshotLake.advise(spark, drift)
      .find(_.kind == "clustering-drift")
    assert(dr.nonEmpty)
    assert(dr.get.action.contains("zorder") &&
      dr.get.metric.contains("id,ver"))
    // a compact destroys the recorded layout -> drift advice retires
    SnapshotLake.compact(spark, drift)
    assert(!SnapshotLake.advise(spark, drift)
      .exists(_.kind == "clustering-drift"))

    // bloom coverage hole: declare blooms on append 1, omit on append 2
    val hole = s"${TempDirs.create("adv-bloom")}/lake"
    SnapshotLake.append(spark, hole, kv((1L, "a", 1L)).coalesce(1),
      statsCols = Seq("id"), bloomCols = Seq("id"))
    SnapshotLake.append(spark, hole, kv((2L, "b", 1L)).coalesce(1),
      statsCols = Seq("id"))
    val bl = SnapshotLake.advise(spark, hole)
      .find(_.kind == "bloom-coverage")
    assert(bl.nonEmpty && bl.get.metric.contains("1/2"))

    // the SQL doorway serves the same recommendations
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.maint")
    spark.sql("DROP TABLE IF EXISTS graft.maint.mor")
    spark.sql("CREATE TABLE graft.maint.mor (id BIGINT, v STRING, " +
      "ver BIGINT) USING `graft-snapshot` " +
      "TBLPROPERTIES ('dmlMode' 'mor', 'statsCols' 'id')")
    val morRoot2 = s"$warehouse/maint/mor"
    SnapshotLake.append(spark, morRoot2,
      kv((1L, "a", 1L), (2L, "b", 1L)).coalesce(1), statsCols = Seq("id"))
    (2 to 6).foreach { i =>
      SnapshotLake.merge(spark, morRoot2, kv((1L, s"a$i", i.toLong)),
        keyCols = Seq("id"), versionCol = "ver", pruneKey = "id")
    }
    val rows = spark.sql("CALL graft.system.advise('maint.mor')").collect()
    assert(rows.nonEmpty)
    assert(rows.exists(r => r.getString(0) == "pending-deletes" &&
      r.getString(3).contains("optimize")))
  }

  test("autoCompactSidecars: the streaming merge compacts itself when a " +
      "file's sidecar stack crosses the threshold — exactly-once " +
      "untouched, replays skip both commits, state intact") {
    val root = s"${TempDirs.create("auto-compact")}/lake"
    SnapshotLake.create(spark, root, kvSchema,
      tableProps = Map("dmlMode" -> "mor", "statsCols" -> "id"))
    SnapshotLake.append(spark, root,
      kv((1L, "a", 1L), (2L, "b", 1L)).coalesce(1), statsCols = Seq("id"))
    val h = SnapshotLake.mergeStreamComposite(root, keyCols = Seq("id"),
      versionCol = "ver", pruneKeys = Seq("id"), streamId = "ac",
      autoCompactSidecars = 2)
    h(kv((1L, "a2", 2L)), 0L) // stack 1 — below threshold, no compact
    val m1 = SnapshotLake.manifest(spark, root)
    assert(m1.files.exists(_.deletes.nonEmpty) && m1.op.startsWith("merge:"))
    h(kv((1L, "a3", 3L), (2L, "b3", 3L)), 1L) // stack 2 -> compact fires
    val m2 = SnapshotLake.manifest(spark, root)
    assert(m2.op == "compact",
      s"policy compact must follow the threshold batch, got ${m2.op}")
    assert(m2.files.forall(_.deletes.isEmpty))
    // replay of batch 1: BOTH the merge and the policy compact skip
    val vBefore = m2.version
    h(kv((1L, "a3", 3L), (2L, "b3", 3L)), 1L)
    assert(SnapshotLake.manifest(spark, root).version == vBefore,
      "a replayed batch must commit nothing (no merge, no compact)")
    val state = SnapshotLake.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(state == Map(1L -> "a3", 2L -> "b3"))
  }
}
