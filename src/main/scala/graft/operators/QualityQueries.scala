package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Oracle-gated query for the declarative data-quality suite: the full
  * constraint catalog evaluated over the deliberately dirty `bars` table
  * (null closes, negative volume, inverted OHLC — exactly the dirt the
  * reference's cleaning stage targets), plus a referential-integrity check
  * lineitem→orders. The DuckDB oracle recomputes every verdict from first
  * principles, pinning the three-valued-logic edges (NULL predicates,
  * any-null key tuples) as SEMANTICS rather than implementation accidents.
  */
object QualityQueries {
  import DataQuality._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq1_quality_suite" -> ((s, dir) => {
      val verdicts = DataQuality.verify(Tables.bars(s, dir), Seq(
        NotNull("symbol"),
        NotNull("close"),
        Completeness("close", 0.9),
        NonNegative("volume"),
        RowRule("high_ge_low", col("high") >= col("low")),
        InRange("open", 0.0, 1e6),
        UniqueKey(Seq("symbol", "ts")),
        MinRows(100)))
      verdicts.unionByName(DataQuality.referentialIntegrity(
        Tables.lineitem(s, dir), "l_orderkey",
        Tables.orders(s, dir), "o_orderkey"))
    }),

    // Row-level quarantine routing: the violating rows with their rule
    // tags, straight off the one-projection router (clean rows filtered
    // by the shared pass). The oracle rebuilds every tag list in SQL.
    "dq2_quarantine" -> ((s, dir) => {
      val routed = DataQuality.quarantine(Tables.bars(s, dir), Seq(
        NotNull("close"),
        NonNegative("volume"),
        RowRule("high_ge_low", col("high") >= col("low"))))
      routed.filter(size(col("_violations")) > 0)
        .select(col("event_id"),
          array_join(col("_violations"), ",").as("viol"))
    }),

    // Constraint DDL (round 15): CHECK / NOT NULL declared as table
    // properties are enforced by EVERY write path at commit time — a
    // violating statement refuses whole and nothing lands (Delta's
    // invariant contract; the check rides the write job via observe, so
    // N constraints cost zero extra passes). The query proves the gate
    // from both sides: a clean load lands, two dirty loads refuse with
    // the version unchanged, and the surviving table equals the clean
    // slice — which is exactly what the oracle recomputes.
    "dq3_constraint_gate" -> ((s, dir) => {
      import graft.sinks.SnapshotLake
      val b = Tables.bars(s, dir).select(col("event_id"), col("symbol"),
        col("ts"), col("close"), col("volume"))
      val root = graft.TempDirs.create("graft-dq3") + "/lake"
      SnapshotLake.create(s, root, b.schema, tableProps = Map(
        "constraint.nonneg_volume" -> "volume >= 0", // NULL passes (SQL CHECK)
        "notNullCols" -> "symbol",
        "statsCols" -> "event_id"))
      val clean = b.filter(col("symbol").isNotNull &&
        coalesce(col("volume") >= 0, lit(true)))
      SnapshotLake.append(s, root, clean.repartition(2),
        statsCols = Seq("event_id"))
      val v = SnapshotLake.latestVersion(s, root).get
      def refuses(df: DataFrame, what: String): Unit = {
        val e = try { SnapshotLake.append(s, root, df); null }
          catch { case t: IllegalArgumentException => t }
        require(e != null && e.getMessage.contains("constraint violation"),
          s"$what must refuse, got $e")
      }
      refuses(b.withColumn("volume",
        lit(-5).cast(b.schema("volume").dataType)), "negative volume")
      refuses(b.withColumn("symbol", lit(null).cast("string")), "null symbol")
      require(SnapshotLake.latestVersion(s, root).contains(v),
        "a refused write must not commit a version")
      SnapshotLake.read(s, root)
    })
  )

  val oracle: Map[String, String] = Map(
    "dq1_quality_suite" -> (Tables.barsSql +
      s""", agg AS (
         |  SELECT count(*) AS n,
         |         sum(CASE WHEN symbol IS NULL THEN 1 ELSE 0 END) AS v_sym,
         |         sum(CASE WHEN close IS NULL THEN 1 ELSE 0 END) AS v_close,
         |         count(close) AS nn_close,
         |         sum(CASE WHEN volume < 0 THEN 1 ELSE 0 END) AS v_vol,
         |         sum(CASE WHEN NOT (high >= low) THEN 1 ELSE 0 END) AS v_hl,
         |         sum(CASE WHEN open < 0.0 OR open > 1000000.0 THEN 1 ELSE 0 END) AS v_open,
         |         sum(CASE WHEN symbol IS NOT NULL AND ts IS NOT NULL THEN 1 ELSE 0 END)
         |           - count(DISTINCT (symbol, ts)) AS v_uk
         |  FROM bars
         |), ri AS (
         |  SELECT count(*) AS orphans FROM (
         |    SELECT DISTINCT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL
         |  ) f
         |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = f.l_orderkey)
         |)
         |SELECT 'not_null' AS rule, 'symbol' AS target,
         |       CAST(v_sym AS DOUBLE) AS value, 0.0 AS threshold, v_sym = 0 AS pass FROM agg
         |UNION ALL SELECT 'not_null', 'close', CAST(v_close AS DOUBLE), 0.0, v_close = 0 FROM agg
         |UNION ALL SELECT 'completeness', 'close',
         |       CAST(nn_close AS DOUBLE) / CAST(n AS DOUBLE), 0.9,
         |       CAST(nn_close AS DOUBLE) / CAST(n AS DOUBLE) >= 0.9 FROM agg
         |UNION ALL SELECT 'non_negative', 'volume', CAST(v_vol AS DOUBLE), 0.0, v_vol = 0 FROM agg
         |UNION ALL SELECT 'row_rule', 'high_ge_low', CAST(v_hl AS DOUBLE), 0.0, v_hl = 0 FROM agg
         |UNION ALL SELECT 'in_range', 'open', CAST(v_open AS DOUBLE), 0.0, v_open = 0 FROM agg
         |UNION ALL SELECT 'unique_key', 'symbol,ts', CAST(v_uk AS DOUBLE), 0.0, v_uk = 0 FROM agg
         |UNION ALL SELECT 'min_rows', '*', CAST(n AS DOUBLE), 100.0, n >= 100 FROM agg
         |UNION ALL SELECT 'referential_integrity', 'l_orderkey->o_orderkey',
         |       CAST(orphans AS DOUBLE), 0.0, orphans = 0 FROM ri""".stripMargin),

    "dq3_constraint_gate" -> (Tables.barsSql +
      s"""
         |SELECT event_id, symbol, ts, close, volume
         |FROM bars
         |WHERE symbol IS NOT NULL AND (volume >= 0 OR volume IS NULL)""".stripMargin),

    "dq2_quarantine" -> (Tables.barsSql +
      s"""
         |SELECT event_id, array_to_string(list_filter([
         |         CASE WHEN close IS NULL THEN 'not_null:close' END,
         |         CASE WHEN volume < 0 THEN 'non_negative:volume' END,
         |         CASE WHEN NOT (high >= low) THEN 'row_rule:high_ge_low' END
         |       ], x -> x IS NOT NULL), ',') AS viol
         |FROM bars
         |WHERE close IS NULL OR volume < 0 OR NOT (high >= low)""".stripMargin)
  )
}
