package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.sinks.{JdbcUpsertSink, Lake}
import graft.sources.{Csv, Generator}

/** In-process fake JDBC endpoint capturing bound batches — proves the
  * upsert sink's batching and binding without a database.
  */
object FakeDb {
  val bound = new ConcurrentLinkedQueue[Vector[Any]]()
  /** (insert SQL, bound row) — lets tests read rows back per table. */
  val boundBySql = new ConcurrentLinkedQueue[(String, Vector[Any])]()
  val executeBatchCalls = new AtomicInteger(0)
  val executedDdl = new ConcurrentLinkedQueue[String]()

  def reset(): Unit = {
    bound.clear(); boundBySql.clear(); executeBatchCalls.set(0); executedDdl.clear()
  }

  /** Plain-statement proxy: records DDL; rejects TimescaleDB-only calls
    * like a vanilla PostgreSQL would (exercises the optional-DDL path).
    */
  private def stProxy(): java.sql.Statement =
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.Statement]),
      new InvocationHandler {
        def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "execute" =>
              val sql = args(0).asInstanceOf[String]
              if (sql.contains("hypertable") || sql.contains("timescaledb") ||
                sql.contains("compression_policy"))
                throw new java.sql.SQLException("function does not exist")
              FakeDb.executedDdl.add(sql)
              java.lang.Boolean.TRUE
            case "close" => null
            case _ => null
          }
      }).asInstanceOf[java.sql.Statement]

  private def psProxy(sql: String): PreparedStatement = {
    val params = scala.collection.mutable.Map[Int, Any]()
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[PreparedStatement]),
      new InvocationHandler {
        def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "setObject" =>
              params(args(0).asInstanceOf[Integer].intValue()) = args(1); null
            case "addBatch" =>
              val row = (1 to params.size).map(params(_)).toVector
              FakeDb.bound.add(row)
              FakeDb.boundBySql.add(sql -> row)
              null
            case "executeBatch" =>
              FakeDb.executeBatchCalls.incrementAndGet(); Array.empty[Int]
            case "close" => null
            case _ => null
          }
      }).asInstanceOf[PreparedStatement]
  }

  def connect(): Connection =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        def invoke(proxy: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "prepareStatement" => psProxy(args(0).asInstanceOf[String])
            case "createStatement" => stProxy()
            case "isClosed" => java.lang.Boolean.FALSE
            case _ => null
          }
      }).asInstanceOf[Connection]
}

class SinksSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("upsert SQL: DO UPDATE sets non-key columns, DO NOTHING doesn't") {
    val cols = Seq("timestamp", "symbol", "open", "close")
    assert(JdbcUpsertSink.upsertSql("ohlcv", cols, Seq("timestamp", "symbol"),
      JdbcUpsertSink.DoUpdate) ==
      "INSERT INTO ohlcv (timestamp, symbol, open, close) VALUES (?, ?, ?, ?) " +
        "ON CONFLICT (timestamp, symbol) DO UPDATE SET open = EXCLUDED.open, close = EXCLUDED.close")
    assert(JdbcUpsertSink.upsertSql("ohlcv", cols, Seq("timestamp", "symbol"),
      JdbcUpsertSink.DoNothing).endsWith("ON CONFLICT (timestamp, symbol) DO NOTHING"))
  }

  test("DDL bootstrap creates table + index, skips Timescale-only DDL, then upserts") {
    FakeDb.reset()
    val ran = graft.sinks.JdbcDdl.bootstrapOhlcv(() => FakeDb.connect())
    // required statements ran; TimescaleDB-specific ones skipped (vanilla PG)
    assert(ran.size == 2)
    assert(ran.head.startsWith("CREATE TABLE IF NOT EXISTS ohlcv_data (timestamp TIMESTAMPTZ NOT NULL, symbol TEXT NOT NULL"))
    assert(ran.head.contains("PRIMARY KEY (timestamp, symbol)"))
    assert(ran(1) ==
      "CREATE INDEX IF NOT EXISTS idx_ohlcv_data_symbol_timestamp ON ohlcv_data (symbol, timestamp DESC)")
    assert(FakeDb.executedDdl.size() == 2)
    // upsert into the table the utility just created
    val bars = Generator.ohlcv(spark, Seq("aaa"), 10)
      .select(col("ts").as("timestamp"), col("symbol"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
      .coalesce(1)
    JdbcUpsertSink.write(bars, "ohlcv_data", Seq("timestamp", "symbol"),
      JdbcUpsertSink.DoUpdate, () => FakeDb.connect())
    assert(FakeDb.bound.size() == 10)
  }

  test("DDL generation maps Spark schemas and rejects unknown types") {
    import org.apache.spark.sql.types._
    val s = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType),
      StructField("price", DecimalType(38, 10))))
    assert(graft.sinks.JdbcDdl.createTableSql("t", s) ==
      "CREATE TABLE IF NOT EXISTS t (id BIGINT NOT NULL, payload BYTEA, price DECIMAL(38, 10))")
    intercept[IllegalArgumentException] {
      graft.sinks.JdbcDdl.sqlType(ArrayType(LongType))
    }
    intercept[IllegalArgumentException] {
      graft.sinks.JdbcDdl.createTableSql("t", s, Seq("missing"))
    }
  }

  test("upsert sink binds every row and batches executes") {
    FakeDb.reset()
    val df = (1 to 25).map(i => (i.toLong, s"s$i", i * 1.5)).toDF("id", "sym", "v")
      .coalesce(1)
    JdbcUpsertSink.write(df, "t", Seq("id"), JdbcUpsertSink.DoUpdate,
      () => FakeDb.connect(), batchSize = 10)
    assert(FakeDb.bound.size() == 25)
    assert(FakeDb.executeBatchCalls.get() == 3) // 10 + 10 + 5
    val first = FakeDb.bound.peek()
    assert(first.length == 3)
  }

  test("metadata store: bootstrap DDL, report + metrics round-trip") {
    FakeDb.reset()
    import graft.pipeline.Pipeline
    import graft.sources.Generator

    // run the pipeline, then persist its observed report
    val bars = Generator.ohlcv(spark, Seq("btc"), 200, intervalSec = 60)
    val res = Pipeline.run(spark, bars, Pipeline.Config())
    val at = java.sql.Timestamp.valueOf("2026-08-12 00:00:00")
    val dsId = Pipeline.persistReport(spark, res, "btc_1m", "bybit", "btc",
      "1m", at, () => FakeDb.connect())

    // bootstrap created all four reference tables + indexes (vanilla PG)
    val ddl = FakeDb.executedDdl.toArray.map(_.toString)
    for (t <- Seq("dataset_metadata", "validation_reports", "data_lineage",
        "data_quality_metrics"))
      assert(ddl.exists(_.startsWith(s"CREATE TABLE IF NOT EXISTS $t")), t)
    assert(ddl.count(_.startsWith("CREATE INDEX")) == 4)
    // JSONB payload columns survive the TEXT→JSONB swap
    assert(ddl.exists(s => s.contains("validation_details JSONB") &&
      s.contains("errors JSONB") && s.contains("warnings JSONB")))
    // replay-safe keys instead of SERIAL ids
    assert(ddl.exists(s => s.startsWith("CREATE TABLE IF NOT EXISTS validation_reports") &&
      s.contains("PRIMARY KEY (dataset_id, validation_timestamp)")))

    // read the report row back from the captured binds
    val byTable = FakeDb.boundBySql.toArray
      .map(_.asInstanceOf[(String, Vector[Any])])
      .groupBy { case (sql, _) => sql.split("INSERT INTO ")(1).split(" ")(0) }
    val Array((repSql, repRow)) = byTable("validation_reports")
    assert(repSql.contains("ON CONFLICT (dataset_id, validation_timestamp) DO UPDATE"))
    assert(repRow(0) == dsId)
    val cols = repSql.split("\\(")(1).split("\\)")(0).split(", ")
    val rep = cols.zip(repRow).toMap
    assert(rep("total_records") == res.report("rows_in"))
    assert(rep("missing_values") == res.report("null_close"))
    // is_valid mirrors the zero-violation rule (generator bars are clean)
    val violations = res.report("ohlc_violations").asInstanceOf[Long] +
      res.report("negative_volume").asInstanceOf[Long]
    assert(rep("is_valid") == (violations == 0L))
    assert(rep("invalid_records") == violations)
    // validation_details JSON carries the full report verbatim
    val details = org.json4s.jackson.JsonMethods.parse(
      rep("validation_details").toString).values.asInstanceOf[Map[String, Any]]
    assert(details("rows_in") == res.report("rows_in").toString)
    assert(details.keySet.exists(_.startsWith("split_")))

    // one quality-metric row per numeric report entry, same dataset id
    val metrics = byTable("data_quality_metrics")
    assert(metrics.length == res.report.size + res.splitSizes.size)
    assert(metrics.forall { case (_, row) => row(0) == dsId })
    val mnames = metrics.map { case (_, row) => row(1) }.toSet
    assert(mnames.contains("rows_in") && mnames.contains("split_train"))

    // dataset registry row upserts on the deterministic id
    val Array((dmSql, dmRow)) = byTable("dataset_metadata")
    assert(dmSql.contains("ON CONFLICT (dataset_id) DO UPDATE"))
    assert(dmRow(0) == dsId && dmRow(1) == "btc_1m" && dmRow(2) == "bybit")
    // deterministic id: same natural key → same id, different key → different
    assert(graft.sinks.MetaStore.datasetId("btc_1m", "bybit", "btc", "1m") == dsId)
    assert(graft.sinks.MetaStore.datasetId("btc_1m", "bybit", "btc", "5m") != dsId)
  }

  test("archive lake round-trips and prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lake").toString
    val bars = Generator.ohlcv(spark, Seq("aaa", "bbb"), 2000,
      startTs = "2023-12-25 00:00:00", intervalSec = 3600)
    Lake.writeArchive(bars, dir)
    val back = Lake.readArchive(spark, dir)
    assert(back.count() == 4000)
    // partition pruning: the filter must land in PartitionFilters (pruned
    // at planning, not as a data filter; inputFiles ignores pruning so
    // inspect the scan node directly)
    val pruned = back.filter(col("year") === 2024 && col("month") === 1)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.map(_.toString).mkString(",").contains("year"))
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files).forall(_.getPath.toString.contains("year=2024/month=1")))
    // round-trip values (modulo partition cols)
    val a = bars.select("symbol", "ts", "close").orderBy("symbol", "ts").collect()
    val b = back.select("symbol", "ts", "close").orderBy("symbol", "ts").collect()
    assert(a.sameElements(b))
  }

  test("retention janitor drops only partitions past the horizon, no rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ttl").toString
    // 2023-12 .. 2024-03 hourly bars -> 4 month partitions
    val bars = Generator.ohlcv(spark, Seq("aaa"), 2500,
      startTs = "2023-12-01 00:00:00", intervalSec = 3600)
    Lake.writeArchive(bars, dir)
    val before = Lake.readArchive(spark, dir)
      .select("year", "month").distinct().count()
    assert(before == 4)
    // remember a surviving file's modification time: expiry must not rewrite
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val keptPart = new org.apache.hadoop.fs.Path(s"$dir/year=2024/month=3")
    val mtimes = fs.listStatus(keptPart).map(f => f.getPath -> f.getModificationTime).toMap
    val dropped = Lake.expirePartitions(spark, dir, keepMonths = 2,
      asOf = java.time.YearMonth.of(2024, 3))
    assert(dropped == Seq("year=2023/month=12", "year=2024/month=1"))
    val back = Lake.readArchive(spark, dir)
    assert(back.select("year", "month").distinct().count() == 2)
    assert(back.filter(col("year") === 2023).count() == 0)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/year=2023"))) // empty year pruned
    fs.listStatus(keptPart).foreach(f =>
      assert(f.getModificationTime == mtimes(f.getPath))) // untouched, not rewritten
    // idempotent: second run drops nothing
    assert(Lake.expirePartitions(spark, dir, 2, java.time.YearMonth.of(2024, 3)).isEmpty)
  }

  test("backup/restore: checksum catalog, corruption detection, full round-trip") {
    import graft.sinks.Backup
    val lake = java.nio.file.Files.createTempDirectory("graft-bk-src").toString
    val root = java.nio.file.Files.createTempDirectory("graft-bk-dst").toString
    val bars = Generator.ohlcv(spark, Seq("aaa", "bbb"), 500)
    Lake.writeArchive(bars, lake)
    val m = Backup.create(spark, lake, root, "20260812_120000", Some("pre-migration"))
    assert(m.files.nonEmpty && m.files.forall(_.sha256.length == 64))
    assert(Backup.verify(spark, root, "20260812_120000").isEmpty)
    assert(Backup.list(spark, root).map(_.timestamp) == Seq("20260812_120000"))
    // corrupt one backed-up file -> verify names it, restore refuses
    val victim = m.files.find(_.path.endsWith(".parquet")).get
    val vp = java.nio.file.Paths.get(root, "20260812_120000", victim.path)
    java.nio.file.Files.write(vp, "corrupted".getBytes)
    assert(Backup.verify(spark, root, "20260812_120000") == Seq(victim.path))
    intercept[IllegalArgumentException] {
      Backup.restore(spark, root, "20260812_120000")
    }
    // second, intact backup restores the lake bit-for-bit after deletion
    Backup.create(spark, lake, root, "20260812_130000")
    val before = Lake.readArchive(spark, lake)
      .orderBy("symbol", "ts").collect()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(lake))
    Backup.restore(spark, root, "20260812_130000")
    val after = Lake.readArchive(spark, lake)
      .orderBy("symbol", "ts").collect()
    assert(after.sameElements(before))
  }

  test("csv export round-trips through the typed reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString + "/out"
    val bars = Generator.ohlcv(spark, Seq("ccc"), 100)
      .select("symbol", "ts", "open", "high", "low", "close", "volume")
    Lake.writeCsv(bars, dir)
    val back = Csv.readTyped(spark, dir)
    assert(back.count() == 100)
    val a = bars.orderBy("ts").collect()
    val b = back.orderBy("ts").collect()
    (a zip b).foreach { case (x, y) =>
      assert(x.getString(0) == y.getString(0))
      assert(math.abs(x.getDouble(5) - y.getDouble(5)) < 1e-9)
    }
  }

  test("bucketed tables join without any Exchange (co-located join)") {
    val bars = Generator.ohlcv(spark, Seq("aaa", "bbb", "ccc"), 1000)
      .withColumn("key", col("symbol"))
    Lake.writeBucketed(bars.select("key", "ts", "close"), "bkt_left", Seq("key"), 4)
    Lake.writeBucketed(bars.select("key", "ts", "volume"), "bkt_right", Seq("key"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_left")
        .join(spark.table("bkt_right"), Seq("key"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("json export round-trips (records orientation)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString + "/out"
    val bars = Generator.ohlcv(spark, Seq("ddd"), 50)
      .select("symbol", "ts", "close", "volume")
    Lake.writeJson(bars, dir)
    val back = spark.read.json(dir)
    assert(back.count() == 50)
    assert(back.columns.toSet == Set("symbol", "ts", "close", "volume"))
  }

  test("generator is deterministic and OHLC-consistent at any parallelism") {
    val g1 = Generator.ohlcv(spark, Seq("xyz"), 300).orderBy("ts").collect()
    val g2 = Generator.ohlcv(spark, Seq("xyz"), 300).orderBy("ts").collect()
    assert(g1.sameElements(g2))
    g1.foreach { r =>
      val (o, h, l, c) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(h >= math.max(o, c) && l <= math.min(o, c))
      assert(r.getDouble(6) >= 1.0)
    }
  }
}
