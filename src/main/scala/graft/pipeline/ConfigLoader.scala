package graft.pipeline

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON pipeline-config management — the Spark-side of the reference's
  * `PipelineConfig` (config_manager.py:30-89: defaults + deep-merge +
  * dot-notation get/set/save) and the `run_pipeline.py:29-67` entry that
  * drives [[Pipeline.run]] from `config/pipeline_config.json`.
  *
  * Parsing is json4s (bundled with Spark) but the merge is hand-rolled:
  * json4s' own `merge` CONCATENATES arrays, while the reference's
  * `merge_dict` replaces any non-dict value — a config override of
  * `assets: [...]` must replace the default list, not append to it.
  */
object ConfigLoader {

  /** Default config, mirroring config_manager.py:30-64 — same keys, same
    * env-var overrides (all names are from the public reference repo).
    */
  def defaults: JObject = {
    def env(k: String, d: String) = JString(sys.env.getOrElse(k, d))
    JObject(
      "data_dir" -> JString("data/processed"),
      "db_config" -> JObject(
        "host" -> env("DB_HOST", "localhost"),
        "port" -> JInt(BigInt(sys.env.getOrElse("DB_PORT", "5432").toInt)),
        "database" -> env("DB_NAME", "exodus_data"),
        "user" -> env("DB_USER", "postgres"),
        "password" -> env("DB_PASSWORD", "your_password")),
      "providers" -> JObject(
        "bybit" -> JObject(
          "api_key" -> env("BYBIT_API_KEY", "your_api_key"),
          "api_secret" -> env("BYBIT_API_SECRET", "your_api_secret"),
          "testnet" -> JBool(
            sys.env.getOrElse("BYBIT_TESTNET", "true").toLowerCase == "true"))),
      "validation_config" -> JObject(
        "handle_missing" -> JString("interpolate"),
        "outlier_method" -> JString("iqr"),
        "outlier_threshold" -> JDouble(1.5),
        "min_records" -> JInt(100),
        "max_gap_hours" -> JInt(24)),
      "split_config" -> JObject(
        "train_test_split" -> JObject(
          "test_size" -> JDouble(0.2),
          "method" -> JString("chronological"))),
      "storage_config" -> JObject(
        "save_files" -> JBool(true),
        "store_db" -> JBool(true),
        "file_format" -> JString("parquet"),
        "compression" -> JString("snappy")))
  }

  /** Reference merge semantics (config_manager.py:80-89): recurse when BOTH
    * sides are objects, otherwise the update value replaces wholesale
    * (arrays included).
    */
  def deepMerge(base: JValue, update: JValue): JValue = (base, update) match {
    case (JObject(b), JObject(u)) =>
      val bm = b.toMap
      val merged = scala.collection.mutable.LinkedHashMap[String, JValue](b: _*)
      u.foreach { case (k, v) =>
        merged(k) = bm.get(k) match {
          case Some(bv) => deepMerge(bv, v)
          case None => v
        }
      }
      JObject(merged.toList)
    case (_, u) => u
  }

  /** Defaults deep-merged with an optional config file. Missing file →
    * defaults only; MALFORMED file → defaults plus a stderr warning —
    * both mirror the reference's try/except-warn fallback
    * (config_manager.py:66-73), which never fails pipeline startup over
    * a bad config.
    */
  def load(path: String): View = {
    val base: JValue = defaults
    val merged =
      if (path != null && Files.exists(Paths.get(path)))
        try deepMerge(base, JsonMethods.parse(Files.readString(Paths.get(path))))
        catch {
          case e: Exception =>
            System.err.println(
              s"Warning: Failed to load config file $path: ${e.getMessage}")
            base
        }
      else base
    View(merged)
  }

  def parse(json: String): View = View(deepMerge(defaults, JsonMethods.parse(json)))

  /** An immutable view over the merged config with the reference's
    * dot-notation `get`/`set` (config_manager.py:91-131).
    */
  final case class View(config: JValue) {

    def get(key: String): Option[JValue] =
      key.split('.').foldLeft(Option(config)) {
        case (Some(JObject(fields)), k) => fields.toMap.get(k)
        case _ => None
      }

    def getString(key: String): Option[String] = get(key).collect {
      case JString(s) => s
    }

    def getDouble(key: String): Option[Double] = get(key).collect {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JDecimal(d) => d.toDouble
    }

    def getBool(key: String): Option[Boolean] = get(key).collect {
      case JBool(b) => b
    }

    /** Dot-notation set; intermediate non-objects are replaced by objects
      * (config_manager.py:115-131 creates missing levels).
      */
    def set(key: String, value: JValue): View = {
      def go(cur: JValue, ks: List[String]): JValue = ks match {
        case Nil => value
        case k :: rest =>
          val fields = cur match {
            case JObject(f) => f
            case _ => Nil
          }
          val fm = scala.collection.mutable.LinkedHashMap[String, JValue](fields: _*)
          fm(k) = go(fm.getOrElse(k, JObject(Nil)), rest)
          JObject(fm.toList)
      }
      View(go(config, key.split('.').toList))
    }

    def save(path: String): Unit = {
      val p = Paths.get(path)
      if (p.getParent != null) Files.createDirectories(p.getParent)
      Files.writeString(p, JsonMethods.pretty(JsonMethods.render(config)),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
        StandardOpenOption.WRITE)
    }

    /** Map the JSON keys the reference's `process_data`/`split_data` read
      * (crypto_pipeline.py:181-203,434-438) onto [[Pipeline.Config]]:
      * normalize/normalize_method, aggregate/aggregate_timeframe,
      * splits.train_test_split.test_size, and the storage file path.
      * Keys live under `pipeline_config` (run_pipeline.py:55), with
      * `split_config` as the defaults-level fallback.
      */
    def toPipelineConfig: Pipeline.Config = {
      val pc = "pipeline_config"
      val normalize =
        if (getBool(s"$pc.normalize").getOrElse(false))
          Some(getString(s"$pc.normalize_method").getOrElse("zscore"))
        else None
      val resample =
        if (getBool(s"$pc.aggregate").getOrElse(false))
          getString(s"$pc.aggregate_timeframe")
            .orElse(getString(s"$pc.timeframe"))
            // reference timeframe codes ("1h") → Spark intervals; an
            // already-Spark interval string passes through untouched
            .map(tf => graft.operators.Resample.frames.getOrElse(tf, tf))
        else None
      val testSize = getDouble(s"$pc.splits.train_test_split.test_size")
        .orElse(getDouble("split_config.train_test_split.test_size"))
        .getOrElse(0.2)
      val out =
        if (getBool(s"$pc.save_files")
              .orElse(getBool("storage_config.save_files")).getOrElse(false))
          getString("data_dir")
        else None
      Pipeline.Config(
        resampleTo = resample,
        normalize = normalize,
        indicators = getBool(s"$pc.indicators").getOrElse(false),
        split = Pipeline.SplitConfig(Seq(1.0 - testSize), Seq("train", "test")),
        outputPath = out)
    }
  }
}
