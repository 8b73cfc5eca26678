package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.sources.Tables

/** The §3.1 CLI entry point — the Spark shape of `run_pipeline.py:46-67`:
  * load `config/pipeline_config.json` (defaults deep-merged underneath),
  * resolve the pipeline, run it asset by asset, report results.
  *
  * Usage: `runMain graft.pipeline.RunPipeline <configPath> <barsDir> [outDir]`
  *   - configPath: pipeline config JSON ([[ConfigLoader]]; a missing file
  *     runs pure defaults, like the reference's silent fallback)
  *   - barsDir: testdata sf directory for the bars source (the container
  *     has no exchange network; the extract stage reads the lake instead —
  *     the connector path is exercised by ConnectorSpec)
  *   - outDir: overrides the config's data_dir for the parquet export
  *
  * Differences from the reference, both deliberate (SURVEY §7.3.6-7):
  * the asset loop SHARES one SparkSession (the reference rebuilds its
  * stack per asset), and per-asset isolation is try/catch with the error
  * recorded in the summary — `results["errors"]` — not a process exit.
  */
object RunPipeline {

  def main(args: Array[String]): Unit = {
    val configPath = args.headOption.getOrElse("config/pipeline_config.json")
    val barsDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val summary = run(spark, configPath, barsDir, args.lift(2))
      summary.foreach { case (asset, outcome) =>
        println(s"[pipeline] $asset -> $outcome")
      }
      if (summary.values.exists(_.startsWith("ERROR"))) sys.exit(1)
    } finally spark.stop()
  }

  /** Run every configured asset through [[Pipeline.run]]; returns
    * asset → outcome ("rows=N splits=…" or "ERROR: …"). The asset list is
    * `pipeline_config.assets` (config/pipeline_config.json:6-14); absent
    * one, the whole bars table runs as a single unnamed asset.
    */
  def run(spark: SparkSession, configPath: String, barsDir: String,
      outDir: Option[String]): Map[String, String] = {
    import org.json4s._
    val view0 = ConfigLoader.load(configPath)
    val view = outDir.fold(view0)(d => view0.set("data_dir", JString(d)))
    val cfg = view.toPipelineConfig
    val bars = Tables.bars(spark, barsDir)
    val assets: Seq[String] = view.get("pipeline_config.assets") match {
      case Some(JArray(items)) =>
        items.collect { case JObject(fields) =>
          fields.toMap.get("symbol").collect { case JString(s) => s }
        }.flatten
      case _ => Nil
    }
    val perAsset: Seq[(String, org.apache.spark.sql.DataFrame)] =
      if (assets.isEmpty) Seq("all" -> bars)
      else assets.map(sym => sym -> bars.filter(col("symbol") === sym))
    perAsset.map { case (asset, df) =>
      try {
        val assetCfg = cfg.copy(outputPath =
          cfg.outputPath.map(p => s"$p/$asset"))
        val res = Pipeline.run(spark, df, assetCfg)
        val splits = res.splitSizes.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(",")
        asset -> (s"rows=${res.splitSizes.values.sum} splits[$splits] " +
          s"report[rows_in=${res.report.getOrElse("rows_in", 0L)}]")
      } catch {
        case e: Exception => asset -> s"ERROR: ${e.getMessage}"
      }
    }.toMap
  }
}
