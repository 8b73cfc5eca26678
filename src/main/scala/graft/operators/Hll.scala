package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{JavaMath, TextHash}

/** Mergeable HyperLogLog sketches for approximate COUNT DISTINCT — the
  * one aggregate class a pre-aggregated rollup cannot serve exactly
  * (distinct doesn't decompose), and the reason every at-scale store
  * (BigQuery, Druid, the DataSketches ecosystem) keeps SKETCH STATE
  * instead: register tables merge by elementwise max, so sketches
  * re-aggregate across time buckets, refresh incrementally from appended
  * deltas, and roll up from fine groups to coarse ones — all without
  * re-touching raw data.
  *
  * Design for the oracle gate (everything bit-replayable in DuckDB):
  *  - hash = [[TextHash.tokenHash]] of the value's string form (md5-hex
  *    prefix → nonnegative 60-bit long, the engine's standing
  *    cross-engine hash);
  *  - slot = low p bits, w = the remaining 60−p bits, rho = leading-zero
  *    rank of w in its (60−p)-bit window (a generated threshold chain —
  *    no float log2, whose libm rounding differs near powers of two);
  *  - the harmonic sum Σ 2^−r is computed EXACTLY: each term scaled by
  *    2^(60−p−... ) wait-free as longs — terms 2^(wBits+1−r) summed with
  *    ordinary associative long addition (max possible sum m·2^(wBits+1)
  *    < 2^63), so no float-order dependence exists anywhere before the
  *    single final division;
  *  - estimator = raw HLL with the standard small-range linear-counting
  *    branch; ln via [[JavaMath.jlog]]'s libm (DuckDB-identical).
  *
  * Accuracy: the classic 1.04/√m — p=9 (512 registers) ≈ 4.6%, p=12
  * ≈ 1.6%; VectorSpec-style floors are asserted in DedupSpec against
  * exact counts.
  *
  * Scale shape: `registers` is explode-free — one row per input row into
  * a (group, slot) hash aggregate whose map-side combine caps each
  * task's shuffle at m rows per group; `estimate` is a second bounded
  * aggregate over ≤ m rows per group. A 100 TB corpus shuffles
  * kilobytes per task per group, and the register table IS the
  * persistable sketch.
  */
object Hll {

  /** Register width: w carries 60−p bits, rho ranges 1..(60−p)+1. */
  private def wBits(p: Int) = 60 - p

  private def rhoCol(w: Column, p: Int): Column =
    (0 until wBits(p)).foldLeft(lit(wBits(p) + 1): Column)((acc, k) =>
      when(w >= lit(1L << k), lit(wBits(p) - k)).otherwise(acc))

  /** The rho CASE chain's DuckDB mirror (same thresholds, same order). */
  private def rhoSql(w: String, p: Int): String = {
    val whens = (wBits(p) - 1 to 0 by -1).map(k =>
      s"WHEN $w >= ${1L << k} THEN ${wBits(p) - k}").mkString(" ")
    s"CASE $whens ELSE ${wBits(p) + 1} END"
  }

  /** Per-(group, slot) max-rho register table — THE sketch. One row per
    * observed slot; absent slots are implicit zeros. NULL values are
    * skipped (SQL COUNT DISTINCT semantics).
    */
  def registers(df: DataFrame, groupCols: Seq[String], value: Column,
      p: Int = 12): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val h = TextHash.tokenHash(value.cast("string"))
    df.filter(value.isNotNull)
      .select(groupCols.map(col) :+
        (h.bitwiseAND(lit((m - 1).toLong))).as("slot") :+
        rhoCol(shiftright(h, p), p).as("rho"): _*)
      .groupBy((groupCols :+ "slot").map(col): _*)
      .agg(max(col("rho")).as("r"))
  }

  /** Merge sketches (same p): elementwise max by (group, slot). This is
    * what makes the sketch INCREMENTAL — yesterday's registers + the
    * delta batch's registers = the union's registers, no raw re-scan.
    */
  def mergeRegisters(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "slot").map(col): _*)
      .agg(max(col("r")).as("r"))

  /** HLL estimate from a register table: raw harmonic estimator with the
    * standard linear-counting branch below 2.5·m when empty registers
    * remain. Returns one row per group with `approx_distinct` (DOUBLE —
    * it is an estimate, not a count).
    */
  def estimate(regs: DataFrame, groupCols: Seq[String],
      p: Int = 12): DataFrame = {
    val m = 1 << p
    val scale = wBits(p) + 1 // term = 2^(scale - r), r in 1..scale ⇒ ≥ 1
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    // numerator constant alpha·m²·2^scale, ONE double, embedded on both
    // engines so the only rounding is the final division
    val c = alpha * m * m * math.pow(2.0, scale)
    val grouped = regs.groupBy(groupCols.map(col): _*)
      // the Scala shiftleft API pins numBits to a literal; the SQL form
      // takes an expression (exact long power of two per register)
      .agg(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $scale - r)"))
        .as("s_present"),
        count(lit(1)).as("nz"))
    val zeros = lit(m.toLong) - col("nz")
    val sTotal = col("s_present") + zeros * lit(1L << scale)
    val raw = lit(c) / sTotal.cast("double")
    val linear = lit(m.toDouble) *
      JavaMath.jlog(lit(m.toDouble) / zeros.cast("double"))
    grouped.select(groupCols.map(col) :+
      when(raw <= lit(2.5 * m) && zeros > 0, linear).otherwise(raw)
        .as("approx_distinct"): _*)
  }

  /** One-shot grouped approximate distinct. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], value: Column,
      p: Int = 12): DataFrame =
    estimate(registers(df, groupCols, value, p), groupCols, p)

  /** STREAMING distinct-count sketch: a `foreachBatch` handler that folds
    * each micro-batch's registers into a snapshot-lake register table.
    * The fold is [[graft.sinks.SnapshotLake.merge]] with `versionCol = r`
    * — keep-latest-by-r over (group, slot) keys IS elementwise max — so
    * the lake converges to the union sketch with the manifest's
    * torn-free commit guarantees, and because max-merge is IDEMPOTENT, a
    * replayed micro-batch re-merges to the identical state: exactly-once
    * EFFECTS without any batch-id bookkeeping (a property the
    * append-shaped sinks need the (streamId, batchId) discipline for).
    * `estimate(SnapshotLake.read(root))` serves the live distinct count
    * at any moment; pinned versions give the count as-of any commit.
    */
  def registerStream(root: String, groupCols: Seq[String], value: Column,
      p: Int = 12): (DataFrame, Long) => Unit = { (df, _) =>
    import graft.sinks.SnapshotLake
    val spark = df.sparkSession
    val regs = registers(df, groupCols, value, p)
    if (SnapshotLake.latestVersion(spark, root).isEmpty)
      SnapshotLake.append(spark, root, regs, statsCols = Seq("slot"))
    else
      SnapshotLake.merge(spark, root, regs,
        keyCols = groupCols :+ "slot", versionCol = "r", pruneKey = "slot")
  }

  /** The full DuckDB mirror for `approxDistinct(src, groupCols, value, p)`
    * — registers, exact scaled harmonic sum, same estimator branches.
    * `valueSql` must be the value's string form (e.g.
    * `CAST(user_id AS VARCHAR)`).
    */
  def approxDistinctSql(src: String, groupCols: Seq[String],
      valueSql: String, p: Int = 12): String = {
    val m = 1 << p
    val scale = wBits(p) + 1
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val c = alpha * m * m * math.pow(2.0, scale)
    val g = groupCols.mkString(", ")
    val h = graft.functions.OracleSql.tokenHash(valueSql)
    s"""hashed AS (
       |  SELECT $g, $h AS h FROM $src WHERE $valueSql IS NOT NULL
       |),
       |regs AS (
       |  SELECT $g, h & ${(m - 1).toLong} AS slot,
       |         max(${rhoSql(s"(h >> $p)", p)}) AS r
       |  FROM hashed GROUP BY $g, h & ${(m - 1).toLong}
       |),
       |agg AS (
       |  SELECT $g,
       |         sum(CAST(1 AS BIGINT) << ($scale - r)) AS s_present,
       |         count(*) AS nz
       |  FROM regs GROUP BY $g
       |)
       |SELECT $g,
       |       CASE WHEN CAST('$c' AS DOUBLE) /
       |                 CAST(s_present + ($m - nz) * (CAST(1 AS BIGINT) << $scale) AS DOUBLE)
       |                 <= ${2.5 * m} AND ($m - nz) > 0
       |            THEN CAST($m AS DOUBLE) * ln(CAST($m AS DOUBLE) / CAST($m - nz AS DOUBLE))
       |            ELSE CAST('$c' AS DOUBLE) /
       |                 CAST(s_present + ($m - nz) * (CAST(1 AS BIGINT) << $scale) AS DOUBLE)
       |       END AS approx_distinct
       |FROM agg""".stripMargin
  }
}
