package graft.sinks

import java.sql.{Connection, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.util.LongAccumulator

/** K5/K6 — batched JDBC upsert / insert-ignore sink (reference
  * timeseries_db.py:399-434 `ON CONFLICT DO UPDATE` and
  * postgresql_storage.py:88-154 `ON CONFLICT DO NOTHING`).
  *
  * The reference's known bottleneck is one SQL statement per row
  * (`iterrows`, SURVEY §6 anti-baseline); this sink runs per PARTITION with
  * addBatch/executeBatch, so throughput scales with executor count and
  * batch size instead of round-trips. Connections are created inside
  * `foreachPartition` via a serializable factory — no driver-side state
  * ships to executors. Statement construction is pure and unit-tested;
  * exactly-once on replay comes from the conflict clause (idempotent
  * writes), mirroring the reference's upsert-on-replay semantics (§2.8).
  */
object JdbcUpsertSink {

  sealed trait ConflictMode
  /** INSERT … ON CONFLICT (keys) DO UPDATE SET non-keys (K5). */
  case object DoUpdate extends ConflictMode
  /** INSERT … ON CONFLICT (keys) DO NOTHING (K6). */
  case object DoNothing extends ConflictMode

  /** Build the PostgreSQL upsert statement for `columns` with conflict
    * target `keys`. Pure — unit-tested without a database.
    */
  def upsertSql(table: String, columns: Seq[String], keys: Seq[String],
      mode: ConflictMode): String = {
    require(keys.nonEmpty && keys.forall(columns.contains))
    val collist = columns.mkString(", ")
    val placeholders = Seq.fill(columns.size)("?").mkString(", ")
    val conflict = mode match {
      case DoNothing => "DO NOTHING"
      case DoUpdate =>
        val sets = columns.filterNot(keys.contains)
          .map(c => s"$c = EXCLUDED.$c").mkString(", ")
        s"DO UPDATE SET $sets"
    }
    s"INSERT INTO $table ($collist) VALUES ($placeholders) " +
      s"ON CONFLICT (${keys.mkString(", ")}) $conflict"
  }

  /** Bind one row's values in column order (1-based JDBC parameters). */
  def bindRow(ps: PreparedStatement, row: Row): Unit = {
    var i = 0
    while (i < row.length) {
      if (row.isNullAt(i)) ps.setObject(i + 1, null)
      else ps.setObject(i + 1, row.get(i))
      i += 1
    }
  }

  /** Write `df` through `connect` with `batchSize`-row executeBatch calls.
    * `written` (optional accumulator) counts attempted rows for the
    * inserted/skipped stats the reference reports
    * (postgresql_storage.py:140-150).
    */
  def write(df: DataFrame, table: String, keys: Seq[String], mode: ConflictMode,
      connect: () => Connection, batchSize: Int = 1000,
      written: Option[LongAccumulator] = None): Unit = {
    val columns = df.columns.toSeq
    val sql = upsertSql(table, columns, keys, mode)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = connect()
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          var inBatch = 0
          rows.foreach { row =>
            bindRow(ps, row)
            ps.addBatch()
            inBatch += 1
            written.foreach(_.add(1))
            if (inBatch >= batchSize) { ps.executeBatch(); inBatch = 0 }
          }
          if (inBatch > 0) ps.executeBatch()
          conn.commit()
          ps.close()
        } finally conn.close()
      }
    }
  }
}
