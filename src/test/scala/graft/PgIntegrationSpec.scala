package graft

import java.sql.{Connection, DriverManager, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.util.LongAccumulator

import graft.sinks.{JdbcDdl, JdbcUpsertSink}
import graft.sources.Jdbc

/** Real-database integration for the JDBC surface (reference
  * tests/setup_test_db.py:9-56 runs against a live PostgreSQL/TimescaleDB).
  * Every test is gated on `SPARK_GRAFT_PG_URL` — a full JDBC URL including
  * credentials, e.g. `jdbc:postgresql://host:5432/graft?user=u&password=p`
  * — and cancels (not passes, not fails) when it is unset. The fake-endpoint
  * unit specs in SinksSourcesSpec stay the always-on coverage.
  *
  * To RUN it in this container (round 9): `tools/pg_sidecar.sh` stands up
  * the shipped PostgreSQL server (trust auth, localhost:5432), and the
  * test-scope wire-protocol driver ([[graft.pgtest.MiniPgDriver]]) stands
  * in for the absent pgjdbc jar:
  * {{{
  *   tools/pg_sidecar.sh
  *   SPARK_GRAFT_PG_URL='jdbc:postgresql://localhost:5432/graft?user=graft' \
  *     sbt "testOnly graft.PgIntegrationSpec"
  * }}}
  */
class PgIntegrationSpec extends SparkSpec {

  private val urlOpt: Option[String] = sys.env.get("SPARK_GRAFT_PG_URL")

  private def withPg(testName: String)(body: (() => Connection) => Unit): Unit =
    test(testName) {
      assume(urlOpt.isDefined, "SPARK_GRAFT_PG_URL not set; skipping live-PG test")
      // the container ships no pgjdbc jar (zero egress); the test-scope
      // wire-protocol driver registers itself here (sbt's forked-test
      // classloader is invisible to DriverManager's ServiceLoader scan)
      graft.pgtest.MiniPgDriver.ensureRegistered()
      val url = urlOpt.get
      val connect: () => Connection = () => DriverManager.getConnection(url)
      body(connect)
    }

  private val table = "graft_it_ohlcv"

  private def bars(rows: Seq[(String, String, Double)]): org.apache.spark.sql.DataFrame = {
    val schema = StructType(Seq(
      StructField("timestamp", TimestampType, nullable = false),
      StructField("symbol", StringType, nullable = false),
      StructField("open", DoubleType, nullable = false),
      StructField("high", DoubleType, nullable = false),
      StructField("low", DoubleType, nullable = false),
      StructField("close", DoubleType, nullable = false),
      StructField("volume", DoubleType, nullable = false)))
    val data = rows.map { case (ts, sym, px) =>
      Row(Timestamp.valueOf(ts), sym, px, px + 1, px - 1, px + 0.5, 100.0)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
  }

  withPg("bootstrap DDL creates the OHLCV table and index") { connect =>
    val conn = connect()
    try {
      conn.createStatement().execute(s"DROP TABLE IF EXISTS $table")
    } finally conn.close()
    val ran = JdbcDdl.bootstrapOhlcv(connect, table)
    // required statements (create table, index) must have run; hypertable/
    // compression statements are optional and depend on TimescaleDB.
    assert(ran.exists(_.startsWith("CREATE TABLE")))
    assert(ran.exists(_.startsWith("CREATE INDEX")))
    // idempotent: a second bootstrap is a no-op, not an error
    assert(JdbcDdl.bootstrapOhlcv(connect, table).nonEmpty)
  }

  withPg("DoUpdate upsert overwrites conflicting keys, keeps others") { connect =>
    JdbcDdl.bootstrapOhlcv(connect, table)
    val conn = connect()
    try conn.createStatement().execute(s"TRUNCATE $table") finally conn.close()

    val acc = new LongAccumulator(); spark.sparkContext.register(acc, "written")
    JdbcUpsertSink.write(
      bars(Seq(("2024-01-01 00:00:00", "BTCUSDT", 100.0),
               ("2024-01-01 00:01:00", "BTCUSDT", 101.0))),
      table, Seq("timestamp", "symbol"), JdbcUpsertSink.DoUpdate, connect,
      written = Some(acc))
    assert(acc.value == 2)

    // second batch: one conflicting key with a new price, one new key
    JdbcUpsertSink.write(
      bars(Seq(("2024-01-01 00:01:00", "BTCUSDT", 999.0),
               ("2024-01-01 00:02:00", "BTCUSDT", 102.0))),
      table, Seq("timestamp", "symbol"), JdbcUpsertSink.DoUpdate, connect)

    val back = Jdbc.readRanged(spark, urlOpt.get, table, "extract(epoch from timestamp)::bigint",
      0L, 4102444800L, numPartitions = 2)
    assert(back.count() == 3)
    val updated = back.filter("timestamp = timestamp '2024-01-01 00:01:00'")
      .select("open").collect().map(_.getDouble(0))
    assert(updated.sameElements(Array(999.0)), "conflict row must carry the new value")
  }

  withPg("DoNothing insert-ignore keeps the original row") { connect =>
    JdbcDdl.bootstrapOhlcv(connect, table)
    val conn = connect()
    try conn.createStatement().execute(s"TRUNCATE $table") finally conn.close()

    JdbcUpsertSink.write(bars(Seq(("2024-02-01 00:00:00", "ETHUSDT", 50.0))),
      table, Seq("timestamp", "symbol"), JdbcUpsertSink.DoNothing, connect)
    JdbcUpsertSink.write(bars(Seq(("2024-02-01 00:00:00", "ETHUSDT", 77.0))),
      table, Seq("timestamp", "symbol"), JdbcUpsertSink.DoNothing, connect)

    val conn2 = connect()
    try {
      val rs = conn2.createStatement()
        .executeQuery(s"SELECT open FROM $table WHERE symbol = 'ETHUSDT'")
      assert(rs.next() && rs.getDouble(1) == 50.0, "first write must win under DoNothing")
      assert(!rs.next())
    } finally conn2.close()
  }
}
