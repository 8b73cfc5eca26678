package graft

import graft.meta.Meta
import graft.meta.Meta.{DatasetMeta, LineageEdge}

class MetaSpec extends SparkSpec {
  import spark.implicits._

  private def dm(id: Long, name: String, sym: String = "BTCUSDT") =
    DatasetMeta(id, name, sym, "1m", "bybit", 1000L + id, f"sha$id%032x", 0.98,
      Map("archived" -> "true", "codec" -> "zstd"))

  test("metadata round-trips through the JSON catalog including extra map") {
    val meta = Meta.metaDs(spark, Seq(dm(1, "raw"), dm(2, "clean"), dm(3, "hourly", "ETHUSDT")))
    val back = Meta.fromJsonCatalog(spark, Meta.toJsonCatalog(meta)).collect()
      .sortBy(_.dataset_id)
    assert(back.length == 3)
    assert(back(0) == dm(1, "raw"))
    assert(back(2).extra("codec") == "zstd")
  }

  test("1-hop lineage join decorates edges with names and broadcasts") {
    val meta = Meta.metaDs(spark, Seq(dm(1, "raw"), dm(2, "clean"), dm(3, "hourly")))
    val edges = spark.createDataset(Seq(
      LineageEdge(1, 2, "clean"), LineageEdge(2, 3, "resample_1h")))
    val out = Meta.lineage1Hop(edges, meta).collect()
      .map(r => (r.getString(1), r.getString(3), r.getString(4))).toSet
    assert(out == Set(("raw", "clean", "clean"), ("clean", "hourly", "resample_1h")))
    val plan = Meta.lineage1Hop(edges, meta).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("catalog summary counts distincts") {
    val meta = Meta.metaDs(spark, Seq(dm(1, "a"), dm(2, "b", "ETHUSDT"), dm(3, "c")))
    val r = Meta.summary(meta).collect().head
    assert(r.getLong(0) == 2) // symbols
    assert(r.getLong(4) == 3) // datasets
  }

  test("file catalog round-trips save -> index -> load, and rebuilds a lost index") {
    import graft.meta.FileCatalog
    val dir = java.nio.file.Files.createTempDirectory("graft-meta").toString
    val k1 = FileCatalog.save(spark, dir, dm(1, "raw"))
    val k2 = FileCatalog.save(spark, dir, dm(2, "eth", "ETHUSDT"))
    assert(k1 == "BTCUSDT_1m" && k2 == "ETHUSDT_1m")
    // index has both; search narrows by symbol without reading documents
    val idx = FileCatalog.index(spark, dir)
    assert(idx.keySet == Set(k1, k2))
    assert(idx(k1).rows == 1001L)
    assert(FileCatalog.search(spark, dir, symbol = Some("ETHUSDT")).map(_.file) ==
      Seq("ETHUSDT_1m.json"))
    // full document round-trip including the extra map
    assert(FileCatalog.load(spark, dir, k1).contains(dm(1, "raw")))
    assert(FileCatalog.load(spark, dir, "missing_1m").isEmpty)
    // lose the index; rebuild from per-dataset files
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "index.json"))
    assert(FileCatalog.index(spark, dir).isEmpty)
    val rebuilt = FileCatalog.rebuildIndex(spark, dir)
    assert(rebuilt == idx)
    // save of the same key overwrites in place (update semantics)
    FileCatalog.save(spark, dir, dm(9, "raw2"))
    assert(FileCatalog.index(spark, dir)(k1).rows == 1009L)
    assert(FileCatalog.load(spark, dir, k1).get.dataset_id == 9L)
  }

  test("lake-vs-DB reconciliation reports per-key coverage and the overall census") {
    import graft.meta.{FileCatalog, Reconcile}
    import graft.sinks.MetaStore
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")

    // seeded lake: BTCUSDT has 4 actual rows, ETHUSDT 2
    val base = java.nio.file.Files.createTempDirectory("graft-recon").toString
    Seq(("BTCUSDT", 1), ("BTCUSDT", 2), ("BTCUSDT", 3), ("BTCUSDT", 4),
        ("ETHUSDT", 1), ("ETHUSDT", 2))
      .toDF("symbol", "v").write.parquet(s"$base/lake")
    val lake = Reconcile.lakeCounts(spark.read.parquet(s"$base/lake"), "1m")

    // DB side: BTC fully registered (4), ETH under-registered (1),
    // SOL registered with no lake file at all
    val metaDf = MetaStore.datasetMetadataDf(spark, "btc_1m", "bybit",
        "BTCUSDT", "1m", 4L, t0, t1)
      .union(MetaStore.datasetMetadataDf(spark, "eth_1m", "bybit",
        "ETHUSDT", "1m", 1L, t0, t1))
      .union(MetaStore.datasetMetadataDf(spark, "sol_1m", "bybit",
        "SOLUSDT", "1m", 7L, t0, t1))

    val report = Reconcile.coverage(lake, Reconcile.dbCounts(metaDf))
    val byKey = report.collect().map(r => (r.getString(0),
      (Option(r.get(2)), Option(r.get(3)), Option(r.get(4)), r.getString(5)))).toMap
    assert(byKey("BTCUSDT") == (Some(4L), Some(4L), Some(100.0), "MATCH"))
    assert(byKey("ETHUSDT") == (Some(2L), Some(1L), Some(50.0), "MISMATCH"))
    assert(byKey("SOLUSDT") == (None, Some(7L), None, "DB_ONLY"))

    val s = Reconcile.coverageSummary(report).collect().head
    assert(s.getLong(0) == 6L)              // total lake rows
    assert(s.getLong(1) == 12L)             // total registered rows
    assert(s.getDouble(2) == 200.0)         // reference formula: db/file*100
    assert((s.getLong(3), s.getLong(4), s.getLong(5), s.getLong(6)) == ((1L, 1L, 0L, 1L)))

    // the catalog side plugs into the same report: claimed vs registered
    val catDir = java.nio.file.Files.createTempDirectory("graft-recon-cat").toString
    FileCatalog.save(spark, catDir, dm(21, "eth", "ETHUSDT")) // claims 1021 rows
    val viaCatalog = Reconcile.coverage(
      Reconcile.catalogCounts(spark, catDir), Reconcile.dbCounts(metaDf))
    val eth = viaCatalog.filter($"symbol" === "ETHUSDT").collect().head
    assert(eth.getString(5) == "MISMATCH" && eth.getLong(2) == 1021L)
  }
}
