package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{VectorIndex, VectorOps}

class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("persisted index serves bit-identical results to the in-memory IVF-PQ") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.1")
    val q = emb.filter(col("vec_id") < 8)
    val dir = tmp("graft-vidx")

    val built = VectorIndex.build(emb, dir, nCentroids = 16, m = 16,
      ksub = 32, coarseIters = 2, pqIters = 2, sampleMod = 3)
    // load round-trips the quantizers exactly (doubles are bit-stable
    // through parquet)
    val loaded = VectorIndex.load(spark, dir)
    assert(loaded.coarse.map(_._1).sameElements(built.coarse.map(_._1)))
    assert(loaded.coarse.zip(built.coarse).forall { case ((_, a), (_, b)) =>
      a.sameElements(b) })
    assert(loaded.codebooks.length == built.codebooks.length)
    val flatLoaded = loaded.codebooks.toSeq.flatMap(_.toSeq)
    val flatBuilt = built.codebooks.toSeq.flatMap(_.toSeq)
    assert(flatLoaded.zip(flatBuilt).forall {
      case ((ca, va), (cb, vb)) => ca == cb && va.sameElements(vb) })

    val served = VectorIndex.topK(q, emb, loaded, k = 10, nProbe = 4)
      .collect().map(_.toString).sorted
    val inMem = VectorOps.ivfPqTopK(q, emb, 10,
        built.coarse, built.codebooks, nProbe = 4)
      .collect().map(_.toString).sorted
    assert(served.sameElements(inMem))
  }

  test("probing prunes codes partitions at the filesystem level") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val dir = tmp("graft-vidx-prune")
    val idx = VectorIndex.build(emb, dir, nCentroids = 16, m = 16,
      ksub = 32, coarseIters = 2, pqIters = 2, sampleMod = 3)

    // files ACTUALLY READ (the scan's numFiles metric, after execution) —
    // the isin on the partition column must prune directories, not rows
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.sum
    }
    val all = spark.read.parquet(s"$dir/codes")
    val one = spark.read.parquet(s"$dir/codes")
      .filter(col("cent_id").cast("long").isin(idx.coarse.head._1))
    val (fullFiles, prunedFiles) = (filesRead(all), filesRead(one))
    assert(prunedFiles < fullFiles,
      s"expected partition pruning: full=$fullFiles pruned=$prunedFiles")
    // and the executed scan carries it as a PartitionFilters entry, not a
    // post-scan Filter over all rows
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cent_id"),
      s"cent_id should be a partition filter:\n$plan")
  }

  test("stats census sums to the corpus; imbalance factor is sane") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val dir = tmp("graft-vidx-stats")
    val idx = VectorIndex.build(emb, dir, nCentroids = 16, m = 16,
      ksub = 32, coarseIters = 2, pqIters = 2, sampleMod = 3)
    val census = VectorIndex.stats(spark, idx).collect()
    assert(census.map(_.getAs[Long]("n")).sum == emb.count())
    assert(census.length <= 16)
    val lambda = VectorIndex.imbalance(spark, idx)
    // 1.0 = perfectly balanced; k = everything in one list
    assert(lambda >= 1.0 - 1e-9 && lambda <= 16.0 + 1e-9, s"imbalance=$lambda")
    info(f"IVF list imbalance factor on sf0.01: $lambda%.2f")
  }

  test("append encodes with stored codebooks; planted near-dup is found") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select("vec_id", "embedding")
    val dir = tmp("graft-vidx-append")
    val base = emb.filter(col("vec_id") >= 100)
    val idx = VectorIndex.build(base, dir, nCentroids = 8, m = 16,
      ksub = 32, coarseIters = 2, pqIters = 2, sampleMod = 3)

    // append the held-out head; the index must now serve them
    VectorIndex.append(emb.filter(col("vec_id") < 100), idx)
    assert(VectorIndex.codes(spark, idx).count() == emb.count())

    // a planted twin of vector 0 (vec_id outside the corpus) must find
    // vector 0 at rank 1 after exact re-rank — through the appended codes
    val twin = emb.filter(col("vec_id") === 0)
      .select(lit(900001L).as("vec_id"), col("embedding"))
    val hits = VectorIndex.topK(twin, emb.unionByName(twin), idx,
        k = 3, nProbe = 8)
      .collect()
    assert(hits.head.getAs[Long]("neighbor_id") == 0L,
      s"twin should rank its source first: ${hits.mkString(", ")}")
    assert(hits.head.getAs[Double]("cosine") > 0.999)
  }

  test("streaming append lands query-ready partitions exactly once") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val dir = tmp("graft-vidx-stream")
    val ckpt = tmp("graft-vidx-ckpt")
    val idx = VectorIndex.build(emb.filter(col("vec_id") < 400), dir,
      nCentroids = 8, m = 16, ksub = 32, coarseIters = 2, pqIters = 2, sampleMod = 3)
    val before = VectorIndex.codes(spark, idx).count()

    val input = MemoryStream[(Long, Array[Float])](spark)
    val stream = input.toDF().toDF("vec_id", "embedding")
    val query = VectorIndex.appendStream(stream, idx, ckpt)
    val delta = emb.filter(col("vec_id") >= 400)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    input.addData(delta.toIndexedSeq)
    query.processAllAvailable()
    query.stop()

    val after = VectorIndex.codes(spark, idx)
    assert(after.count() == before + delta.length)
    // the streamed codes are the batch encoder's codes, bit for bit
    val batchCodes = VectorOps.ivfAssign(
        emb.filter(col("vec_id") >= 400), idx.coarse, 1)
      .select(col("vec_id"), col("cent_id"),
        graft.functions.Pq.encode(col("embedding"),
          idx.codebooks.map(_.map(_._2))).as("codes"))
      .collect().map(_.toString).sorted
    val streamed = after.filter(col("vec_id") >= 400)
      .select("vec_id", "cent_id", "codes")
      .collect().map(_.toString).sorted
    assert(streamed.sameElements(batchCodes))

    // compaction folds the delta into the main segment: same rows, same
    // codes, delta directory gone
    val beforeCompact = VectorIndex.codes(spark, idx)
      .select("vec_id", "cent_id", "codes")
      .collect().map(_.toString).sorted
    VectorIndex.compact(spark, idx)
    assert(!new java.io.File(s"$dir/codes_stream").exists())
    val afterCompact = VectorIndex.codes(spark, idx)
      .select("vec_id", "cent_id", "codes")
      .collect().map(_.toString).sorted
    assert(afterCompact.sameElements(beforeCompact))
    // idempotent when there is nothing to compact
    VectorIndex.compact(spark, idx)
    assert(VectorIndex.codes(spark, idx).count() == before + delta.length)
  }

  test("delete tombstones vectors: queries exclude them, compact folds them away") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select("vec_id", "embedding")
    val dir = tmp("graft-vidx-del")
    val idx = VectorIndex.build(emb, dir, nCentroids = 8, m = 16,
      ksub = 32, coarseIters = 2, pqIters = 2, sampleMod = 3)
    val total = emb.count()

    // a planted twin of vector 0 finds it at rank 1 (pre-delete witness)
    val twin = emb.filter(col("vec_id") === 0)
      .select(lit(900001L).as("vec_id"), col("embedding"))
    val corpus = emb.unionByName(twin)
    val before = VectorIndex.topK(twin, corpus, idx, k = 3, nProbe = 8).collect()
    assert(before.head.getAs[Long]("neighbor_id") == 0L)

    // delete vector 0: every read path excludes it immediately
    VectorIndex.delete(Seq(0L).toDF("vec_id"), idx)
    assert(VectorIndex.codes(spark, idx).count() == total - 1)
    assert(VectorIndex.stats(spark, idx).agg(sum("n")).head.getLong(0) == total - 1)
    val after = VectorIndex.topK(twin, corpus, idx, k = 3, nProbe = 8).collect()
    assert(after.forall(_.getAs[Long]("neighbor_id") != 0L),
      s"deleted vector still served: ${after.mkString(", ")}")

    // deleting an absent id is a no-op
    VectorIndex.delete(Seq(987654321L).toDF("vec_id"), idx)
    assert(VectorIndex.codes(spark, idx).count() == total - 1)

    // compact folds tombstones physically: directory gone, codes shrunk,
    // served rows identical to the tombstone-filtered view
    val preCompact = VectorIndex.codes(spark, idx)
      .select("vec_id", "cent_id", "codes").collect().map(_.toString).sorted
    VectorIndex.compact(spark, idx)
    assert(!new java.io.File(s"$dir/tombstones").exists())
    val postCompact = VectorIndex.codes(spark, idx)
      .select("vec_id", "cent_id", "codes").collect().map(_.toString).sorted
    assert(postCompact.sameElements(preCompact))
    assert(VectorIndex.codes(spark, idx).count() == total - 1)
    // physical fold: vec 0's row is not in the parquet at all
    assert(spark.read.parquet(s"$dir/codes")
      .filter(col("vec_id") === 0L).count() == 0)
  }

  test("interrupted compaction swap recovers without data loss") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select("vec_id", "embedding")
    val dir = tmp("graft-vidx-crash")
    val idx = VectorIndex.build(emb, dir, nCentroids = 8, m = 16,
      ksub = 32, coarseIters = 2, pqIters = 2, sampleMod = 3)
    val want = VectorIndex.codes(spark, idx)
      .select("vec_id", "cent_id", "codes").collect().map(_.toString).sorted

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")

    // crash between the two renames: main missing, tmp holds the new
    // segment — recovery must roll FORWARD
    VectorIndex.delete(Seq(-1L).toDF("vec_id"), idx) // no-op tombstone forces work
    val live = VectorIndex.codes(spark, idx)
    live.write.mode("overwrite").partitionBy("cent_id")
      .parquet(p("codes_compacting").toString)
    assert(fs.rename(p("codes"), p("codes_old")))
    VectorIndex.recoverSwap(spark, dir)
    assert(fs.exists(p("codes")) && !fs.exists(p("codes_old"))
      && !fs.exists(p("codes_compacting")) && !fs.exists(p("tombstones")))
    val recovered = VectorIndex.codes(spark, idx)
      .select("vec_id", "cent_id", "codes").collect().map(_.toString).sorted
    assert(recovered.sameElements(want))

    // crash after the write but before any rename: tmp is discarded,
    // main untouched (fresh codes() — `live`'s plan captured the now
    // tombstone-bearing read)
    VectorIndex.codes(spark, idx).write.mode("overwrite").partitionBy("cent_id")
      .parquet(p("codes_compacting").toString)
    VectorIndex.recoverSwap(spark, dir)
    assert(fs.exists(p("codes")) && !fs.exists(p("codes_compacting")))
    assert(VectorIndex.codes(spark, idx).count() == want.length)

    // crash with old present and NO tmp (rollback case): old is restored
    assert(fs.rename(p("codes"), p("codes_old")))
    VectorIndex.recoverSwap(spark, dir)
    assert(fs.exists(p("codes")) && !fs.exists(p("codes_old")))
    val rolledBack = VectorIndex.codes(spark, idx)
      .select("vec_id", "cent_id", "codes").collect().map(_.toString).sorted
    assert(rolledBack.sameElements(want))
  }
}
