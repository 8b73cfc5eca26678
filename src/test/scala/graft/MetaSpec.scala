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
}
