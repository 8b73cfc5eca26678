package graft.sinks

import java.sql.Connection

import org.apache.spark.sql.types._

/** K7 — driver-side JDBC DDL bootstrap (reference
  * timeseries_db.py:138-203 `create_ohlcv_hypertable` and
  * postgresql_storage.py:55-86 `create_table_if_not_exists`): create the
  * target table + indexes so [[JdbcUpsertSink]] never assumes a
  * pre-provisioned schema.
  *
  * Statement construction is PURE (schema → SQL strings, unit-tested
  * without a database); [[run]] executes them on one driver connection —
  * DDL is a metadata operation, never distributed. Optional statements
  * (the TimescaleDB hypertable/compression calls, which plain PostgreSQL
  * lacks) are best-effort, mirroring the reference's try/except-pass
  * around its compression block (timeseries_db.py:184-196).
  */
object JdbcDdl {

  /** Spark → PostgreSQL column type (the reference's target dialect). */
  def sqlType(dt: DataType): String = dt match {
    case TimestampType | TimestampNTZType => "TIMESTAMPTZ"
    case DateType => "DATE"
    case StringType => "TEXT"
    case DoubleType => "DOUBLE PRECISION"
    case FloatType => "REAL"
    case LongType => "BIGINT"
    case IntegerType => "INT"
    case ShortType => "SMALLINT"
    case BooleanType => "BOOLEAN"
    case BinaryType => "BYTEA"
    case d: DecimalType => s"DECIMAL(${d.precision}, ${d.scale})"
    case other => throw new IllegalArgumentException(s"no JDBC DDL mapping for $other")
  }

  /** CREATE TABLE IF NOT EXISTS from a Spark schema; non-nullable fields
    * become NOT NULL, `primaryKey` (if any) a table constraint.
    */
  def createTableSql(table: String, schema: StructType,
      primaryKey: Seq[String] = Nil): String = {
    require(primaryKey.forall(schema.fieldNames.contains),
      s"primary key ${primaryKey.mkString(",")} not in schema")
    val cols = schema.fields.map { f =>
      s"${f.name} ${sqlType(f.dataType)}${if (f.nullable) "" else " NOT NULL"}"
    }
    val pk = if (primaryKey.isEmpty) Nil
      else Seq(s"PRIMARY KEY (${primaryKey.mkString(", ")})")
    s"CREATE TABLE IF NOT EXISTS $table (${(cols ++ pk).mkString(", ")})"
  }

  /** CREATE INDEX IF NOT EXISTS on `cols` ((name, descending?)) — the
    * reference's `(symbol, timestamp DESC)` lookup index
    * (timeseries_db.py:177-182; timescaledb_schema.sql:24-27).
    */
  def createIndexSql(table: String, cols: Seq[(String, Boolean)]): String = {
    val name = s"idx_${table}_${cols.map(_._1).mkString("_")}"
    val spec = cols.map { case (c, desc) => if (desc) s"$c DESC" else c }
    s"CREATE INDEX IF NOT EXISTS $name ON $table (${spec.mkString(", ")})"
  }

  /** The reference's OHLCV bootstrap, statement for statement
    * (timeseries_db.py:152-196): table, hypertable conversion (optional —
    * TimescaleDB only), symbol+time index, compression policy (optional).
    * Returns (sql, required): optional statements may fail without failing
    * the bootstrap.
    */
  def ohlcvBootstrapSql(table: String = "ohlcv_data"): Seq[(String, Boolean)] = {
    val schema = StructType(Seq(
      StructField("timestamp", TimestampType, nullable = false),
      StructField("symbol", StringType, nullable = false),
      StructField("open", DoubleType, nullable = false),
      StructField("high", DoubleType, nullable = false),
      StructField("low", DoubleType, nullable = false),
      StructField("close", DoubleType, nullable = false),
      StructField("volume", DoubleType, nullable = false),
      StructField("hour", IntegerType),
      StructField("day_of_week", IntegerType),
      StructField("month", IntegerType),
      StructField("year", IntegerType)))
    Seq(
      createTableSql(table, schema, primaryKey = Seq("timestamp", "symbol")) -> true,
      s"SELECT create_hypertable('$table', 'timestamp', if_not_exists => TRUE)" -> false,
      createIndexSql(table, Seq("symbol" -> false, "timestamp" -> true)) -> true,
      (s"ALTER TABLE $table SET (timescaledb.compress, " +
        s"timescaledb.compress_segmentby = 'symbol')") -> false,
      s"SELECT add_compression_policy('$table', INTERVAL '90 days')" -> false)
  }

  /** Execute `statements` on one driver-side connection. Required
    * statements propagate their exception; optional ones are skipped on
    * failure. Returns the statements that actually succeeded.
    */
  def run(connect: () => Connection,
      statements: Seq[(String, Boolean)]): Seq[String] = {
    val conn = connect()
    try {
      statements.flatMap { case (sql, required) =>
        val st = conn.createStatement()
        try {
          st.execute(sql)
          Some(sql)
        } catch {
          case e: Exception if !required => None
        } finally st.close()
      }
    } finally conn.close()
  }

  /** Bootstrap-then-upsert convenience: guarantee the table exists, then
    * hand off to [[JdbcUpsertSink.write]] (the reference always creates
    * before writing, crypto_pipeline.py storage setup).
    */
  def bootstrapOhlcv(connect: () => Connection, table: String = "ohlcv_data"): Seq[String] =
    run(connect, ohlcvBootstrapSql(table))
}
