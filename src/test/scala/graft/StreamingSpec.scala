package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamRollup

case class InBar(symbol: String, ts: Timestamp, open: Double, high: Double,
    low: Double, close: Double, volume: Double)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private def bar(sym: String, ts: String, px: Double, vol: Double = 1.0) =
    InBar(sym, t(ts), px, px + 1, px - 1, px + 0.5, vol)

  test("tumbling rollup finalizes buckets after watermark, dedups replays, drops late data") {
    val input = MemoryStream[InBar](spark)
    val rolled = StreamRollup.ohlcvTumbling(input.toDF(), "1 hour", "1 hour")
    val q = rolled.writeStream
      .format("memory").queryName("rollup_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // hour-10 bucket: two bars + one exact replay (must not double count)
      input.addData(
        bar("aaa", "2024-01-01 10:00:00", 100.0, 5.0),
        bar("aaa", "2024-01-01 10:30:00", 102.0, 7.0),
        bar("aaa", "2024-01-01 10:30:00", 102.0, 7.0))
      q.processAllAvailable()
      // nothing finalized yet — watermark still at epoch
      assert(spark.table("rollup_out").count() == 0)

      // advance event time past 12:00 -> watermark 11:00+ finalizes hour 10
      input.addData(bar("aaa", "2024-01-01 12:30:00", 110.0))
      q.processAllAvailable()
      input.addData(bar("aaa", "2024-01-01 13:45:00", 111.0))
      q.processAllAvailable()
      val hour10 = spark.table("rollup_out")
        .filter($"bucket_ts" === t("2024-01-01 10:00:00")).collect()
      assert(hour10.length == 1)
      val r = hour10.head
      assert(r.getAs[Double]("open") == 100.0) // earliest-ts open
      assert(r.getAs[Double]("close") == 102.5) // latest-ts close
      assert(r.getAs[Double]("volume") == 12.0) // replay NOT double-counted
      assert(r.getAs[Long]("n_bars") == 2L)

      // a bar far behind the watermark is dropped, bucket not re-emitted
      input.addData(bar("aaa", "2024-01-01 10:45:00", 999.0))
      q.processAllAvailable()
      assert(spark.table("rollup_out")
        .filter($"bucket_ts" === t("2024-01-01 10:00:00")).count() == 1)
    } finally q.stop()
  }

  test("stateful streaming EMA carries state across micro-batches") {
    import graft.streaming.StatefulIndicators
    import graft.streaming.StatefulIndicators.Tick
    val input = MemoryStream[Tick](spark)
    val q = StatefulIndicators.streamingEma(input.toDS(), alpha = 0.5)
      .writeStream.format("memory").queryName("ema_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Tick("s", t("2024-01-01 10:00:00"), 10.0),
        Tick("s", t("2024-01-01 10:01:00"), 20.0))
      q.processAllAvailable()
      // second micro-batch must continue from ema=15, not reseed
      input.addData(Tick("s", t("2024-01-01 10:02:00"), 30.0))
      q.processAllAvailable()
      // stale straggler (<= last state ts) is dropped
      input.addData(Tick("s", t("2024-01-01 10:01:30"), 999.0))
      q.processAllAvailable()
      val emas = spark.table("ema_out").orderBy("ts").collect()
        .map(r => r.getAs[Double]("ema")).toSeq
      assert(emas == Seq(10.0, 15.0, 22.5))
    } finally q.stop()
  }

  test("streaming as-of enrich: latest quote at-or-before, out-of-order safe") {
    import graft.streaming.StreamAsOf
    import graft.streaming.StreamAsOf.{probe, quote, MarketEvent}
    val input = MemoryStream[MarketEvent](spark)
    val q = StreamAsOf.enrichAsOf(input.toDS(), horizonMs = 3600_000L)
      .writeStream.format("memory").queryName("asof_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: quote@10:00 100, quote@10:05 105; probes before/on/after
      input.addData(
        quote("s", t("2024-01-01 10:00:00"), 100.0),
        quote("s", t("2024-01-01 10:05:00"), 105.0),
        probe("s", t("2024-01-01 09:59:00"), 1L), // before any quote → None
        probe("s", t("2024-01-01 10:05:00"), 2L), // equal ts → matches 105
        probe("s", t("2024-01-01 10:07:00"), 3L)) // after → 105
      q.processAllAvailable()
      // batch 2: newer quote, then an OUT-OF-ORDER probe older than it —
      // the buffer must serve the historical 10:00 quote, not 10:06's
      input.addData(
        quote("s", t("2024-01-01 10:06:00"), 106.0),
        probe("s", t("2024-01-01 10:02:00"), 4L),
        probe("s", t("2024-01-01 10:08:00"), 5L),
        probe("x", t("2024-01-01 10:00:00"), 6L)) // symbol with no quotes
      q.processAllAvailable()
      val out = spark.table("asof_out").collect()
        .map(r => r.getAs[Long]("probeId") ->
          (if (r.isNullAt(r.fieldIndex("quotePrice"))) None
           else Some(r.getAs[Double]("quotePrice")))).toMap
      assert(out(1L) == None)
      assert(out(2L) == Some(105.0))
      assert(out(3L) == Some(105.0))
      assert(out(4L) == Some(100.0)) // historical match, not latest
      assert(out(5L) == Some(106.0))
      assert(out(6L) == None)
    } finally q.stop()
  }

  test("streaming as-of buffer prunes to the lateness horizon") {
    import graft.streaming.StreamAsOf
    import graft.streaming.StreamAsOf.{probe, quote, MarketEvent}
    val input = MemoryStream[MarketEvent](spark)
    val q = StreamAsOf.enrichAsOf(input.toDS(), horizonMs = 60_000L)
      .writeStream.format("memory").queryName("asof_prune_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        quote("s", t("2024-01-01 10:00:00"), 100.0),
        quote("s", t("2024-01-01 10:10:00"), 110.0))
      q.processAllAvailable()
      // 10:00 quote fell off the 1-minute horizon behind 10:10: a probe
      // at 10:05 must NOT borrow the too-new 10:10 quote → unenriched
      input.addData(probe("s", t("2024-01-01 10:05:00"), 1L))
      q.processAllAvailable()
      val row = spark.table("asof_prune_out").collect().head
      assert(row.isNullAt(row.fieldIndex("quotePrice")))
    } finally q.stop()
  }

  test("streaming rollup lands finalized buckets in a parquet lake") {
    val base = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val input = MemoryStream[InBar](spark)
    val q = graft.streaming.StreamRollup.sinkToLake(
      StreamRollup.ohlcvTumbling(input.toDF(), "1 hour", "1 hour"),
      s"$base/lake", s"$base/ckpt")
    try {
      input.addData(
        bar("ccc", "2024-01-01 10:00:00", 100.0, 5.0),
        bar("ccc", "2024-01-01 10:30:00", 102.0, 7.0))
      q.processAllAvailable()
      input.addData(bar("ccc", "2024-01-01 12:30:00", 110.0))
      q.processAllAvailable()
      input.addData(bar("ccc", "2024-01-01 13:30:00", 111.0))
      q.processAllAvailable()
      val lake = spark.read.parquet(s"$base/lake")
      val hour10 = lake.filter($"bucket_ts" === t("2024-01-01 10:00:00")).collect()
      assert(hour10.length == 1)
      assert(hour10.head.getAs[Double]("volume") == 12.0)
    } finally q.stop()
  }

  test("streaming rollup upserts finalized buckets into JDBC per micro-batch") {
    FakeDb.reset()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-jdbc-ckpt").toString
    val input = MemoryStream[InBar](spark)
    val q = StreamRollup.sinkToJdbc(
      StreamRollup.ohlcvTumbling(input.toDF(), "1 hour", "1 hour"),
      "ohlcv_1h", ckpt, () => FakeDb.connect())
    try {
      input.addData(
        bar("eee", "2024-01-01 10:00:00", 100.0, 5.0),
        bar("eee", "2024-01-01 10:30:00", 102.0, 7.0))
      q.processAllAvailable()
      // watermark-advancing event finalizes hour 10
      input.addData(bar("eee", "2024-01-01 12:30:00", 110.0))
      q.processAllAvailable()
      val byTable = FakeDb.boundBySql.toArray
        .map(_.asInstanceOf[(String, Vector[Any])])
        .filter(_._1.contains("ohlcv_1h"))
      assert(byTable.nonEmpty)
      // idempotent conflict target = the bucket key
      assert(byTable.head._1.contains(
        "ON CONFLICT (symbol, bucket_ts) DO UPDATE"))
      // exactly the finalized hour-10 bucket landed, volume summed
      val cols = byTable.head._1.split("\\(")(1).split("\\)")(0).split(", ")
      val row = cols.zip(byTable.head._2).toMap
      assert(row("symbol") == "eee")
      assert(row("volume") == 12.0)
    } finally q.stop()
  }

  test("JDBC rollup sink: crash-replayed micro-batch leaves table state unchanged") {
    // the exactly-once-TABLE-state claim under at-least-once delivery:
    // kill the query after a batch ran but before its commit marker landed
    // (delete the newest commits/<n>), restart from the same checkpoint so
    // Spark re-executes that micro-batch, and verify the replayed upserts
    // bind IDENTICAL rows — ON CONFLICT DO UPDATE then rewrites a row with
    // its own values, so the folded table state is unchanged.
    FakeDb.reset()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-replay-ckpt").toString
    val input = MemoryStream[InBar](spark)
    def start() = StreamRollup.sinkToJdbc(
      StreamRollup.ohlcvTumbling(input.toDF(), "1 hour", "1 hour"),
      "ohlcv_replay", ckpt, () => FakeDb.connect())

    // fold DO-UPDATE semantics over the recorded upserts: last write per
    // (symbol, bucket_ts) key wins — the fake's view of final table state
    def tableState(): Map[(Any, Any), Vector[Any]] = {
      val rows = FakeDb.boundBySql.toArray
        .map(_.asInstanceOf[(String, Vector[Any])])
        .filter(_._1.contains("ohlcv_replay"))
      val cols = rows.head._1.split("\\(")(1).split("\\)")(0).split(", ").toVector
      val si = cols.indexOf("symbol"); val ti = cols.indexOf("bucket_ts")
      rows.foldLeft(Map.empty[(Any, Any), Vector[Any]]) { case (m, (_, r)) =>
        m + ((r(si), r(ti)) -> r)
      }
    }

    val q1 = start()
    try {
      input.addData(
        bar("fff", "2024-01-01 10:00:00", 100.0, 5.0),
        bar("fff", "2024-01-01 10:30:00", 102.0, 7.0))
      q1.processAllAvailable()
      input.addData(bar("fff", "2024-01-01 12:30:00", 110.0)) // finalizes hour 10
      q1.processAllAvailable()
    } finally q1.stop()
    val upsertsBefore = FakeDb.boundBySql.toArray
      .map(_.asInstanceOf[(String, Vector[Any])]).filter(_._1.contains("ohlcv_replay"))
    assert(upsertsBefore.nonEmpty)
    val stateBefore = tableState()

    // crash before the last commit: drop the newest commit marker so the
    // restarted query re-runs that micro-batch (at-least-once delivery)
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    val crc = new java.io.File(commits.last.getParent, s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists()) crc.delete()

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val upsertsAfter = FakeDb.boundBySql.toArray
      .map(_.asInstanceOf[(String, Vector[Any])]).filter(_._1.contains("ohlcv_replay"))
    // the batch really was reprocessed (at-least-once — MORE upserts) …
    assert(upsertsAfter.length > upsertsBefore.length)
    // … but every replayed row binds values identical to a prior upsert of
    // the same key, so the folded table state is exactly what it was
    assert(tableState() == stateBefore)
    val seen = upsertsBefore.map(_._2).toSet
    assert(upsertsAfter.drop(upsertsBefore.length).forall(r => seen.contains(r._2)))
  }

  test("batch queries serve from the STREAMING rollup lake via RollupRewrite") {
    import graft.plans.{RollupCatalog, RollupRewrite}
    val base = java.nio.file.Files.createTempDirectory("graft-cagg").toString
    val data = Seq(
      bar("ddd", "2024-01-01 10:00:00", 100.0, 5.0),
      bar("ddd", "2024-01-01 10:20:00", 101.0, 7.0),
      bar("ddd", "2024-01-01 10:40:00", 102.0, 2.0),
      bar("ddd", "2024-01-01 11:10:00", 103.0, 4.0))
    // stream the bars through the 15-minute continuous aggregate
    val input = MemoryStream[InBar](spark)
    val q = graft.streaming.StreamRollup.sinkToLake(
      StreamRollup.ohlcvTumbling(input.toDF(), "15 minutes", "1 hour"),
      s"$base/lake15m", s"$base/ckpt")
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      // watermark-advancing event finalizes every data bucket
      input.addData(bar("ddd", "2024-01-02 09:00:00", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    // the SAME rows land as the batch raw table
    data.toDF().write.mode("overwrite").parquet(s"$base/raw")
    val raw = spark.read.parquet(s"$base/raw")
    val expected = graft.operators.Resample.ohlcv(raw, "1 hour")
      .collect().map(_.toString).sorted

    spark.experimental.extraOptimizations = Seq(RollupRewrite)
    try {
      RollupCatalog.register(raw, 15L * 60 * 1000000,
        spark.read.parquet(s"$base/lake15m").withColumnRenamed("bucket_ts", "ts"))
      val coarse = graft.operators.Resample.ohlcv(raw, "1 hour")
      val leaves = coarse.queryExecution.optimizedPlan.collectLeaves().flatMap {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Nil
          }
        case _ => Nil
      }.mkString
      assert(leaves.contains("lake15m") && !leaves.contains("raw"))
      assert(coarse.collect().map(_.toString).sorted.sameElements(expected))
    } finally {
      RollupCatalog.clear()
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("batch and streaming share the same rollup code path") {
    val batch = Seq(
      bar("bbb", "2024-01-01 10:00:00", 100.0, 5.0),
      bar("bbb", "2024-01-01 10:30:00", 102.0, 7.0)
    ).toDF()
    val out = StreamRollup.ohlcvTumbling(batch, "1 hour", "1 hour",
      dedupReplay = false).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("volume") == 12.0)
  }

  test("StreamingDemo lifecycle: clean -> rollup -> snapshot lake + " +
      "incremental profile, exactly-once across a checkpoint restart") {
    import graft.pipeline.StreamingDemo
    import graft.sinks.SnapshotLake
    import graft.operators.Profile
    import org.apache.spark.sql.functions.concat_ws
    val base = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val input = MemoryStream[InBar](spark)
    def start() = StreamingDemo.start(input.toDF(),
      s"$base/lake", s"$base/profile", s"$base/ckpt")
    val wave1 = Seq(
      bar("aaa", "2024-01-01 10:00:00", 100.0, 5.0),
      bar("aaa", "2024-01-01 10:30:00", 102.0, 7.0),
      bar("aaa", "2024-01-01 10:30:00", 102.0, 7.0), // retransmission: dedup
      InBar("aaa", t("2024-01-01 10:40:00"), 100.0, 90.0, 101.0, 95.0, 2.0), // broken envelope: repaired
      InBar("bbb", t("2024-01-01 10:10:00"), 50.0, 51.0, 49.0, 50.0, -3.0)) // negative volume: dropped
    val q = start()
    try {
      input.addData(wave1: _*)
      q.processAllAvailable()
      input.addData(bar("aaa", "2024-01-01 12:30:00", 110.0)) // finalizes hour 10
      q.processAllAvailable()
    } finally q.stop()
    // restart from the checkpoint: the second wave lands exactly-once
    val wave2 = Seq(bar("bbb", "2024-01-01 12:45:00", 55.0, 4.0))
    val sentinel = bar("zzz", "2024-06-01 00:00:00", 1.0)
    val q2 = start()
    try {
      input.addData(wave2: _*)
      q2.processAllAvailable()
      input.addData(sentinel) // watermark jump finalizes everything else
      q2.processAllAvailable()
    } finally q2.stop()

    val lake = SnapshotLake.read(spark, s"$base/lake")
    // batch one-shot over the SAME cleaned input; the sentinel's own
    // bucket never finalizes, so it stays out of the streaming lake
    val raw = (wave1 ++ wave2 ++ Seq(
      bar("aaa", "2024-01-01 12:30:00", 110.0), sentinel)).toDF()
    val expect = StreamRollup.ohlcvTumbling(
      StreamingDemo.cleanStream(raw).dropDuplicates("symbol", "ts"),
      "1 hour", "1 hour", dedupReplay = false)
      .filter($"bucket_ts" < t("2024-06-01 00:00:00"))
    assert(lake.collect().toSet == expect.collect().toSet)
    // the repaired envelope made it through repaired, not dropped:
    // low := min(open, close, low) = min(100, 95, 101) = 95, below the
    // clean bars' 99/101
    assert(lake.filter($"symbol" === "aaa" &&
      $"bucket_ts" === t("2024-01-01 10:00:00")).head
      .getAs[Double]("low") == 95.0)
    // dropped negative-volume row: bbb has no hour-10 bucket
    assert(lake.filter($"symbol" === "bbb").count() == 1)
    // maintained profile == one-shot ANALYZE of the lake contents,
    // bit-for-bit, across the restart
    val report = StreamingDemo.report(spark, s"$base/profile")
    val oneShot = Profile.dataset(
      lake.withColumn("__pk", concat_ws("|", $"symbol",
        $"bucket_ts".cast("string"))),
      keyCol = "__pk",
      cols = Seq("symbol", "open", "high", "low", "close", "volume",
        "n_bars"))
    assert(report.collect().toSet == oneShot.collect().toSet)
  }

  test("streaming doc ingest scores, quality-filters, and dedups within watermark") {
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val cleaned = graft.streaming.StreamDocs.cleanStream(docs, minQuality = 0.3, "1 hour")
    val q = cleaned.writeStream
      .format("memory").queryName("docs_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val good = "the quick brown fox jumps over the lazy dog and runs far away today"
      input.addData(
        (1L, t("2024-01-01 10:00:00"), good),
        (2L, t("2024-01-01 10:05:00"), good), // exact dup in the same burst
        (3L, t("2024-01-01 10:10:00"), ""), // degenerate: quality 0.0
        (4L, t("2024-01-01 10:15:00"), good + " with a different ending entirely"))
      q.processAllAvailable()
      val rows = spark.table("docs_out").collect()
      val ids = rows.map(_.getAs[Long]("doc_id")).toSet
      assert(ids == Set(1L, 4L)) // dup 2 dropped, low-quality 3 dropped
      val r1 = rows.find(_.getAs[Long]("doc_id") == 1L).get
      assert(r1.getAs[String]("lang") == "en")
      assert(r1.getAs[Int]("n_tokens") > 10)
      assert(r1.getAs[Double]("quality") >= 0.3)

      // streamed fuzzy-dedup signatures are the BATCH signatures bit for
      // bit (VERDICT r4 item 7): the landed lake can extend a drop list
      // without re-tokenizing
      val landed = spark.table("docs_out")
      val batchDf = Seq(
        (1L, good),
        (4L, good + " with a different ending entirely")).toDF("doc_id", "text")
      val batchMh = graft.operators.Dedup.minhashSignature(
          batchDf, $"text", $"doc_id")
        .collect().map(r => r.getLong(0) -> r).toMap
      val batchSh = graft.operators.Dedup.simhash(
          batchDf, $"text", $"doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (row <- landed.collect()) {
        val id = row.getAs[Long]("doc_id")
        for (i <- 0 until 16) {
          val c = f"mh$i%02d"
          assert(row.getAs[Long](c) == batchMh(id).getAs[Long](c),
            s"doc $id col $c diverges from batch")
        }
        assert(row.getAs[Long]("simhash") == batchSh(id),
          s"doc $id simhash diverges from batch")
      }

      // streamed verdict + PII scrub are the batch x7/x8 forms bit for bit
      val batchVs = batchDf.select($"doc_id",
          graft.operators.TextOps.filterVerdict($"text").as("verdict"),
          graft.operators.TextOps.scrubPii($"text").as("scrubbed"))
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
      for (row <- landed.collect()) {
        val id = row.getAs[Long]("doc_id")
        assert(row.getAs[String]("verdict") == batchVs(id)._1)
        assert(row.getAs[String]("scrubbed") == batchVs(id)._2)
      }
    } finally q.stop()
  }

  test("streaming ANN enrichment == batch index lookup for the same queries") {
    import graft.operators.VectorIndex
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val dir = java.nio.file.Files.createTempDirectory("graft-enrich-idx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-enrich-ckpt").toString
    val idx = VectorIndex.build(emb, dir, nCentroids = 8, m = 16, ksub = 32,
      coarseIters = 2, pqIters = 2, sampleMod = 3)

    val collected = scala.collection.mutable.ArrayBuffer.empty[String]
    val input = MemoryStream[(Long, Array[Float])](spark)
    val stream = input.toDF().toDF("vec_id", "embedding")
    val q = graft.streaming.StreamVectorEnrich.enrich(
      stream, emb, idx, k = 5, checkpoint = ckpt, nProbe = 8) { out =>
      collected.synchronized {
        collected ++= out.collect().map(_.toString)
      }
    }
    try {
      val queries = emb.filter(col("vec_id") < 6)
        .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      input.addData(queries.take(3).toIndexedSeq) // two micro-batches:
      q.processAllAvailable()                     // the lookup is per-batch
      input.addData(queries.drop(3).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val batch = VectorIndex.topK(emb.filter(col("vec_id") < 6), emb, idx,
        k = 5, nProbe = 8)
      .collect().map(_.toString)
    assert(collected.sorted.sameElements(batch.sorted))
  }

  test("streaming sessions: late bridge event merges provisional sessions; batch-identical") {
    val input = MemoryStream[(Long, Timestamp, Double)](spark)
    val events = input.toDF().toDF("user_id", "ts", "value")
    val q = graft.streaming.StreamSessions
      .sessions(events, gapSeconds = 600L, lateness = "1 hour")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append()).start()
    val a = (1L, t("2024-01-01 10:00:00"), 1.0)
    val c = (1L, t("2024-01-01 10:20:00"), 4.0)
    val b = (1L, t("2024-01-01 10:10:00"), 2.0) // late bridge: a~b and b~c ≤ gap
    val late = (1L, t("2024-01-01 12:00:00"), 8.0)
    try {
      input.addData(a, c)
      q.processAllAvailable() // two provisional sessions in state, none emitted
      assert(spark.table("sessions_out").count() == 0)
      input.addData(b)
      q.processAllAvailable() // bridges them into one [10:00, 10:20] session
      input.addData(late) // watermark → 11:00 > 10:20+gap: session finalizes
      q.processAllAvailable()
      val out = spark.table("sessions_out")
        .as[(Long, Long, Long, Long, Double)].collect()
      assert(out.toSeq === Seq((1L, 1704103200000000L, 1704104400000000L, 3L, 7.0)))
      // the same transform over the bounded frame is the batch operator
      val batch = graft.operators.Sessionize.sessionize(
          Seq(a, b, c, late).toDF("user_id", "ts", "value"),
          $"user_id", $"ts", $"value", 600L)
        .filter($"session_end_us" < 1704106800000000L)
        .as[(Long, Long, Long, Long, Double)].collect()
      assert(batch.toSeq === out.toSeq)
    } finally q.stop()
  }

  test("streamed posting ingestion serves bit-identically to a cold rebuild") {
    import org.apache.spark.sql.functions.col
    import graft.operators.{TextIndex, TextSearch}
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-tidx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tidx-ckpt").toString
    val input = MemoryStream[(Long, String)](spark)
    val stream = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.StreamTextIndex.appendStream(
      stream, col("text"), col("doc_id"), dir, ckpt, buckets = 16)
    try {
      val rows = docs.select("doc_id", "text").as[(Long, String)].collect()
      input.addData(rows.take(rows.length / 2).toIndexedSeq)
      q.processAllAvailable() // first batch builds the index from nothing
      input.addData(rows.drop(rows.length / 2).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = TextIndex.topK(spark, dir, Seq("vector", "spark"), 20,
      buckets = 16).collect().map(_.toString).sorted
    val batch = TextSearch.bm25TopK(docs, col("text"), col("doc_id"),
      Seq("vector", "spark"), 20).collect().map(_.toString).sorted
    assert(streamed.sameElements(batch))
  }
}
