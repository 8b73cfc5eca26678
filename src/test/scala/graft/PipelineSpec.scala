package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Pipeline
import graft.sources.{Generator, Tables}

class PipelineSpec extends SparkSpec {

  test("end-to-end: clean -> resample -> indicators -> split with one-pass report") {
    val bars = Generator.ohlcv(spark, Seq("btc", "eth"), 500, intervalSec = 60)
    val res = Pipeline.run(spark, bars, Pipeline.Config(
      resampleTo = Some("15 minutes"),
      indicators = true,
      split = Pipeline.SplitConfig(Seq(0.7, 0.85), Seq("train", "val", "test"))))
    assert(res.report("rows_in") == 1000L)
    assert(res.report("ohlc_violations") == 0L)
    val total = res.splitSizes.values.sum
    assert(total == res.data.count())
    assert(res.splitSizes.keySet == Set("train", "val", "test"))
    // resampled to 15m: 500 minutes -> ceil(500/15)=34 buckets per symbol
    assert(total == 68)
    assert(res.data.columns.contains("sma20") || res.data.columns.exists(_.startsWith("sma")))
  }

  test("dirty bars: report counts violations; cleaning repairs them") {
    val bars = Tables.bars(spark, sfDir)
    val res = Pipeline.run(spark, bars, Pipeline.Config())
    assert(res.report("rows_in").asInstanceOf[Long] > 0)
    assert(res.report("null_close").asInstanceOf[Long] > 0)
    assert(res.report("ohlc_violations").asInstanceOf[Long] > 0)
    // after repair no OHLC violations remain
    val bad = res.data.filter(graft.operators.Cleaning.ohlcInvalid()).count()
    assert(bad == 0)
    // splits are chronological: max train ts <= min test ts
    val cuts = res.data.groupBy("split")
      .agg(min("ts").as("mn"), max("ts").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[java.time.LocalDateTime](1), r.getAs[java.time.LocalDateTime](2))).toMap
    assert(!cuts("train")._2.isAfter(cuts("test")._1))
  }

  test("pipeline normalize stage runs post-resample with clean stats") {
    val bars = Generator.ohlcv(spark, Seq("xrp"), 400)
    val res = Pipeline.run(spark, bars, Pipeline.Config(
      resampleTo = Some("1 hour"),
      normalize = Some("zscore"),
      normalizeCols = Seq("close", "volume")))
    val stats = res.data.agg(
      org.apache.spark.sql.functions.avg("close"),
      org.apache.spark.sql.functions.stddev_samp("close")).collect().head
    assert(math.abs(stats.getDouble(0)) < 1e-9)
    assert(math.abs(stats.getDouble(1) - 1.0) < 1e-9)
  }

  test("config loader: defaults, deep-merge, dot-notation, e2e run") {
    import org.json4s._
    import graft.pipeline.ConfigLoader
    // defaults alone (missing file → reference's silent fallback)
    val dflt = ConfigLoader.load("/nonexistent/pipeline_config.json")
    assert(dflt.getDouble("split_config.train_test_split.test_size").contains(0.2))
    assert(dflt.getString("storage_config.compression").contains("snappy"))

    // a file overriding a NESTED field deep-merges: sibling keys survive
    val tmp = java.nio.file.Files.createTempDirectory("graft-cfg")
    val cfgPath = tmp.resolve("pipeline_config.json")
    java.nio.file.Files.writeString(cfgPath,
      """{"pipeline": "crypto",
        |  "pipeline_config": {
        |    "normalize": true, "normalize_method": "minmax",
        |    "aggregate": true, "aggregate_timeframe": "15m",
        |    "splits": {"train_test_split": {"test_size": 0.25}}
        |  },
        |  "db_config": {"port": 6543}}""".stripMargin)
    val v = ConfigLoader.load(cfgPath.toString)
    assert(v.get("db_config.port").contains(JInt(6543)))
    // deep-merge preserved the sibling default next to the override
    assert(v.getString("db_config.host").isDefined)
    assert(v.getString("pipeline_config.splits.train_test_split.method").isEmpty)
    assert(v.getDouble("pipeline_config.splits.train_test_split.test_size").contains(0.25))

    // dot-notation set creates intermediate levels; save round-trips
    val v2 = v.set("providers.bybit.testnet", JBool(false))
      .set("brand.new.key", JString("x"))
    assert(v2.getBool("providers.bybit.testnet").contains(false))
    assert(v2.getString("brand.new.key").contains("x"))
    val saved = tmp.resolve("saved.json")
    v2.save(saved.toString)
    assert(ConfigLoader.load(saved.toString).getString("brand.new.key").contains("x"))

    // arrays REPLACE on merge (reference merge_dict), never concatenate
    val arr = ConfigLoader.parse("""{"pipeline_config": {"assets": [1, 2]}}""")
      .set("pipeline_config.assets", JArray(List(JInt(9))))
    assert(arr.get("pipeline_config.assets").contains(JArray(List(JInt(9)))))

    // the mapped Pipeline.Config drives the e2e run
    val pc = v.toPipelineConfig
    assert(pc.resampleTo.contains("15 minutes"))
    assert(pc.normalize.contains("minmax"))
    assert(pc.split.cuts == Seq(0.75))
    val bars = Generator.ohlcv(spark, Seq("btc"), 300, intervalSec = 60)
    val res = Pipeline.run(spark, bars, pc.copy(outputPath = None))
    assert(res.splitSizes.keySet == Set("train", "test"))
    assert(res.splitSizes.values.sum == res.data.count())
  }

  test("RunPipeline CLI: config-driven per-asset fan-out with error isolation") {
    import graft.pipeline.RunPipeline
    val tmp = java.nio.file.Files.createTempDirectory("graft-runp")
    val cfgPath = tmp.resolve("pipeline_config.json")
    java.nio.file.Files.writeString(cfgPath,
      """{"pipeline": "crypto",
        |  "pipeline_config": {
        |    "assets": [{"symbol": "click", "timeframe": "1h"},
        |               {"symbol": "view", "timeframe": "1h"}],
        |    "aggregate": true, "aggregate_timeframe": "1h",
        |    "splits": {"train_test_split": {"test_size": 0.2}},
        |    "save_files": false
        |  }}""".stripMargin)
    val summary = RunPipeline.run(spark, cfgPath.toString, sfDir, None)
    assert(summary.keySet == Set("click", "view"))
    assert(summary.values.forall(_.startsWith("rows=")))
    assert(summary("click").contains("train="))
    // missing config file → defaults, single "all" asset; defaults have
    // save_files=true, so redirect data_dir into the temp dir (never the
    // working directory)
    val dflt = RunPipeline.run(spark, "/nonexistent.json", sfDir,
      Some(tmp.resolve("out").toString))
    assert(dflt.keySet == Set("all") && dflt("all").startsWith("rows="))
    assert(java.nio.file.Files.exists(tmp.resolve("out/all")))
  }

  test("pipeline writes the partitioned lake when configured") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pipe").toString + "/lake"
    val bars = Generator.ohlcv(spark, Seq("sol"), 200)
    Pipeline.run(spark, bars, Pipeline.Config(outputPath = Some(dir)))
    val back = graft.sinks.Lake.readArchive(spark, dir)
    assert(back.count() == 200)
    assert(back.columns.contains("split") && back.columns.contains("year"))
  }
}
