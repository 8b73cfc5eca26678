package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.operators.{TextIndex, TextSearch}

/** Persisted inverted-index BM25: bit-identity with the batch scan,
  * filesystem-level bucket pruning, the single-scan build, and the
  * staged-commit crash/replay lifecycle.
  */
class TextIndexSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sfDir)

  private def topKStr(dir: String, terms: Seq[String], k: Int = 20): Array[String] =
    TextIndex.topK(spark, dir, terms, k, buckets = 16)
      .collect().map(_.toString).sorted

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("index-served top-k is bit-identical to the one-shot batch scan") {
    val dir = java.nio.file.Files.createTempDirectory("textidx").toString
    TextIndex.build(docs, col("text"), col("doc_id"), dir, buckets = 16)
    for (terms <- Seq(Seq("vector"), Seq("vector", "join", "spark"))) {
      val idx = topKStr(dir, terms)
      val batch = TextSearch.bm25TopK(docs, col("text"), col("doc_id"), terms, 20)
        .collect().map(_.toString).sorted
      assert(idx.sameElements(batch), s"index != batch for terms=$terms")
    }
  }

  test("duplicate query terms: both paths dedupe to the same contract") {
    val dir = java.nio.file.Files.createTempDirectory("textidx").toString
    TextIndex.build(docs, col("text"), col("doc_id"), dir, buckets = 16)
    val dup = Seq("vector", "vector", "spark")
    assert(topKStr(dir, dup).sameElements(topKStr(dir, dup.distinct)))
    val batchDup = TextSearch.bm25TopK(docs, col("text"), col("doc_id"), dup, 20)
      .collect().map(_.toString).sorted
    assert(topKStr(dir, dup).sameElements(batchDup))
  }

  test("build(half) + append(half) equals build(full) bit-exactly") {
    val dirA = java.nio.file.Files.createTempDirectory("textidx").toString
    val dirB = java.nio.file.Files.createTempDirectory("textidx").toString
    val (lo, hi) = (docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    TextIndex.build(docs, col("text"), col("doc_id"), dirA, buckets = 16)
    TextIndex.build(lo, col("text"), col("doc_id"), dirB, buckets = 16)
    TextIndex.append(spark, hi, col("text"), col("doc_id"), dirB, "b1", buckets = 16)
    assert(topKStr(dirB, Seq("vector", "spark"))
      .sameElements(topKStr(dirA, Seq("vector", "spark"))))
  }

  test("build scans the corpus once (stats observed on the postings pass)") {
    val src = java.nio.file.Files.createTempDirectory("textidx-src").toString
    docs.write.mode("overwrite").parquet(src)
    val n = docs.count()
    val dir = java.nio.file.Files.createTempDirectory("textidx").toString
    @volatile var records = 0L
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          records += e.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      TextIndex.build(spark.read.parquet(src), col("text"), col("doc_id"),
        dir, buckets = 16)
      // listener events are async: poll until the count stabilizes
      var last = -1L; var spins = 0
      while (records != last && spins < 50) {
        last = records; spins += 1; Thread.sleep(100)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // one corpus scan ≈ n input records; the round-6 two-pass build read 2n
    assert(records >= n, s"expected >= $n input records, saw $records")
    assert(records < math.max(n + n / 2, n + 50),
      s"build read $records records for a $n-row corpus — a second full scan?")
    // and the observed stats are the true corpus totals
    val stats = spark.read.parquet(s"$dir/stats_log")
      .agg(sum("n_docs"), sum("sum_dl")).collect()(0)
    assert(stats.getLong(0) == n)
  }

  test("crash lifecycle: no READY marker rolls back, READY rolls forward") {
    val dir = java.nio.file.Files.createTempDirectory("textidx").toString
    val full = java.nio.file.Files.createTempDirectory("textidx").toString
    val (lo, hi) = (docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    TextIndex.build(docs, col("text"), col("doc_id"), full, buckets = 16)
    TextIndex.build(lo, col("text"), col("doc_id"), dir, buckets = 16)
    val loAnswer = topKStr(dir, Seq("vector", "spark"))

    // crash BEFORE the commit marker: staged data must never become visible
    TextIndex.stage(spark, hi, col("text"), col("doc_id"), dir, "crash1", 16)
    fs.delete(new Path(s"$dir/.staging_crash1/_READY"), false)
    TextIndex.recoverPending(spark, dir)
    assert(!fs.exists(new Path(s"$dir/.staging_crash1")))
    assert(topKStr(dir, Seq("vector", "spark")).sameElements(loAnswer),
      "rolled-back staging leaked into query results")

    // crash AFTER the marker, part-way through the renames: recovery
    // must finish the commit (move the rest, append stats exactly once)
    val staging = TextIndex.stage(spark, hi, col("text"), col("doc_id"),
      dir, "crash2", 16)
    val stagedBuckets = fs.listStatus(new Path(s"$staging/p"))
      .filter(_.getPath.getName.startsWith("bucket="))
    assert(stagedBuckets.nonEmpty)
    val b0 = stagedBuckets.head.getPath
    val live0 = new Path(s"$dir/postings/${b0.getName}")
    fs.mkdirs(live0)
    val f0 = fs.listStatus(b0).filter(f => f.isFile &&
      !f.getPath.getName.startsWith("_")).head.getPath
    assert(fs.rename(f0, new Path(live0, f0.getName))) // simulate partial commit
    TextIndex.recoverPending(spark, dir)
    assert(!fs.exists(new Path(s"$dir/.staging_crash2")))
    assert(topKStr(dir, Seq("vector", "spark"))
      .sameElements(topKStr(full, Seq("vector", "spark"))),
      "rolled-forward append != cold rebuild")

    // replaying the committed batch is a no-op (exactly-once commits)
    TextIndex.append(spark, hi, col("text"), col("doc_id"), dir, "crash2",
      buckets = 16)
    assert(topKStr(dir, Seq("vector", "spark"))
      .sameElements(topKStr(full, Seq("vector", "spark"))),
      "replayed batch double-appended")
    assert(spark.read.parquet(s"$dir/stats_log")
      .filter(col("batch_id") === "crash2").count() == 1)
  }

  test("absent terms: empty result, no crash; mixed present/absent still exact") {
    val dir = java.nio.file.Files.createTempDirectory("textidx").toString
    TextIndex.build(docs, col("text"), col("doc_id"), dir, buckets = 16)
    assert(TextIndex.topK(spark, dir, Seq("zzz_not_in_corpus"), 5,
      buckets = 16).count() == 0)
    val idx = topKStr(dir, Seq("vector", "zzz_not_in_corpus"), 10)
    val batch = TextSearch.bm25TopK(docs, col("text"), col("doc_id"),
      Seq("vector", "zzz_not_in_corpus"), 10).collect().map(_.toString).sorted
    assert(idx.sameElements(batch))
  }

  test("query reads only the buckets its terms hash to") {
    val dir = java.nio.file.Files.createTempDirectory("textidx").toString
    TextIndex.build(docs, col("text"), col("doc_id"), dir, buckets = 16)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.sum
    }
    val full = filesRead(spark.read.parquet(s"$dir/postings"))
    val one = filesRead(TextIndex.topK(spark, dir, Seq("vector"), 5, buckets = 16))
    // small corpus: ~30-word vocabulary leaves some of the 16 buckets
    // empty, so the full listing is < 16 files
    assert(full >= 8, s"expected most bucket files present, got $full")
    // one term -> one bucket; the query plan reads it twice (tf pivot +
    // df aggregate), still far under the full listing
    assert(one <= full / 4, s"expected bucket pruning, read $one of $full")
  }

  test("topKBatch is bit-identical to a per-query topK loop") {
    val dir = java.nio.file.Files.createTempDirectory("textidx").toString
    TextIndex.build(docs, col("text"), col("doc_id"), dir, buckets = 16)
    val qs: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("vector", "join", "spark"),
      2L -> Seq("vector"),
      3L -> Seq("spark", "zzz_not_in_corpus"),
      4L -> Seq("zzz_not_in_corpus"),
      5L -> Seq("join", "join", "vector")) // duplicate term in one query
    import spark.implicits._
    val batch = TextIndex.topKBatch(spark, dir,
        qs.toDF("query_id", "terms"), k = 10, buckets = 16)
      .collect().map(_.toString).sorted
    val looped = qs.flatMap { case (qid, terms) =>
      TextIndex.topK(spark, dir, terms, 10, buckets = 16)
        .select(lit(qid).as("query_id"), col("rank"), col("doc_id"), col("score"))
        .collect().map(_.toString)
    }.sorted
    assert(batch.sameElements(looped),
      s"batch=${batch.take(3).mkString(";")} loop=${looped.take(3).mkString(";")}")
  }

  test("compactPostings folds per-batch files; results bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("textidx").toString
    val parts = (0 until 4).map(i => docs.filter(col("doc_id") % 4 === i))
    TextIndex.build(parts(0), col("text"), col("doc_id"), dir, buckets = 8)
    parts.tail.zipWithIndex.foreach { case (p, i) =>
      TextIndex.append(spark, p, col("text"), col("doc_id"), dir, s"b$i",
        buckets = 8)
    }
    val before = topKStr(dir, Seq("vector", "spark"))
    def dataFiles(): Int = {
      val post = new Path(s"$dir/postings")
      fs.listStatus(post).filter(_.getPath.getName.startsWith("bucket="))
        .map(b => fs.listStatus(b.getPath)
          .count(f => f.isFile && !f.getPath.getName.startsWith("_"))).sum
    }
    val filesBefore = dataFiles()
    TextIndex.compactPostings(spark, dir, filesPerBucket = 1)
    val filesAfter = dataFiles()
    assert(filesAfter < filesBefore,
      s"expected compaction to shrink $filesBefore files, got $filesAfter")
    assert(topKStr(dir, Seq("vector", "spark")).sameElements(before),
      "compaction changed query results")
    assert(spark.read.parquet(s"$dir/stats_log").count() == 1,
      "stats log not folded")
    // appends keep working on the compacted index
    assert(TextIndex.topK(spark, dir, Seq("vector"), 5, buckets = 8).count() > 0)
  }

  test("production-sized query batches compile the vocab filter to InSet") {
    // topKBatch filters postings with term.isin(vocab). At eval-suite
    // scale (10^3-10^4 distinct terms) that must optimize to a hash-set
    // membership probe (InSet, O(1)/row), not a 10^4-branch In chain
    // (O(|vocab|)/row comparisons against every postings row that
    // survives pruning). Spark's OptimizeIn does this above
    // spark.sql.optimizer.inSetConversionThreshold (default 10) — this
    // pin guards against regressions (e.g. building the filter as a
    // chain of ORs, which nothing would coalesce).
    val dir = java.nio.file.Files.createTempDirectory("textidx").toString
    TextIndex.build(docs, col("text"), col("doc_id"), dir, buckets = 16)
    import spark.implicits._
    val queries = (0 until 1000).map(i =>
      (i.toLong, Seq("vector", "spark", s"term_$i")))
      .toDF("query_id", "terms")
    val out = TextIndex.topKBatch(spark, dir, queries, k = 5, buckets = 16)
    val opt = out.queryExecution.optimizedPlan.toString
    assert(opt.contains("INSET"),
      "vocab filter did not optimize to InSet — plan:\n" + opt.take(4000))
    // and the batch still answers (real terms present among the noise)
    assert(out.filter(col("doc_id").isNotNull).count() > 0)
  }
}
