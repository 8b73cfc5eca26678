package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextHash

/** One-stop dataset profiling — the ANALYZE/data-profiling operator every
  * warehouse ships, composed from the engine's sketch layer so the cost
  * is THREE bounded passes regardless of column count:
  *
  *  1. one aggregate scan: exact row count, per-column null counts and
  *     (numeric) min/max — a single row out;
  *  2. one HLL pass for per-column approximate distinct counts: each row
  *     explodes into ≤C (column, hash) entries that combine map-side
  *     into ≤C·2^p registers — the shuffle is kilobytes per task no
  *     matter how many rows;
  *  3. one bottom-k sample pass ([[Sketch.sampleBottomK]], global group)
  *     feeding exact `percentile` quantile estimates per numeric column.
  *
  * Output is the tall (column, metric, value) frame BI tools expect:
  * `count` / `n_nulls` (exact), `approx_distinct` (HLL, ±1.6 % at p=12),
  * `min` / `max` (exact) and `q25`/`q50`/`q75` (sample quantiles,
  * O(1/√k) rank error) for numeric columns. Every value is DOUBLE; all
  * of it is a pure function of the data (md5 hashing, exact counts,
  * libm ln) so the DuckDB oracle replays the whole report bit-for-bit.
  */
object Profile {

  private val NumericTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)

  /** Types whose string form is canonical across engines — the HLL hash
    * input. Floats/timestamps are excluded: Spark and DuckDB format them
    * differently (1.0E-4 vs 0.0001), so the md5s would diverge — and
    * distinct-counting continuous values is a profiling smell anyway
    * (min/max/quantiles carry their story).
    */
  private val HllTypes: Set[DataType] =
    Set(StringType, ByteType, ShortType, IntegerType, LongType, BooleanType)

  /** Profile `cols` of `df` (all columns when empty). `keyCol` must be a
    * unique row id (drives the quantile sample).
    */
  def dataset(df: DataFrame, keyCol: String, cols: Seq[String] = Nil,
      p: Int = 12, k: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    val target = if (cols.nonEmpty) cols else df.columns.toSeq
    target.foreach(c => require(df.columns.contains(c),
      s"profile column $c not in ${df.columns.mkString(",")}"))
    val numeric = target.filter(c => NumericTypes(df.schema(c).dataType))
    val hllable = target.filter(c => HllTypes(df.schema(c).dataType))

    // pass 1 — exact census: one aggregate row
    val aggs =
      Seq(count(lit(1)).cast("double").as("__n")) ++
        target.map(c => (count(lit(1)) - count(col(c))).cast("double")
          .as(s"__nulls_$c")) ++
        numeric.flatMap(c => Seq(
          min(col(c)).cast("double").as(s"__min_$c"),
          max(col(c)).cast("double").as(s"__max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head

    // pass 2 — per-column HLL registers from ONE scan: each row explodes
    // into its (column, value-hash) entries; null values drop like
    // COUNT DISTINCT does
    val distincts: Map[String, Double] =
      if (hllable.isEmpty) Map.empty
      else {
        val entries = df.select(explode(array(hllable.map(c =>
          struct(lit(c).as("column"),
            col(c).cast("string").as("v"))): _*)).as("e"))
          .select(col("e.column").as("column"), col("e.v").as("v"))
          .filter(col("v").isNotNull)
        val regs = Hll.registers(entries, Seq("column"), col("v"), p)
        Hll.estimate(regs, Seq("column"), p)
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      }

    // pass 3 — quantiles of the global bottom-k sample per numeric column
    val sample = Sketch.sampleBottomK(df, Nil, col(keyCol), k)
    val qAggs = numeric.flatMap(c => Seq(
      percentile(col(c), lit(0.25)).as(s"__q25_$c"),
      percentile(col(c), lit(0.5)).as(s"__q50_$c"),
      percentile(col(c), lit(0.75)).as(s"__q75_$c")))
    val qRow = if (numeric.isEmpty) null
      else sample.agg(qAggs.head, qAggs.tail: _*).head

    def d(r: Row, name: String): Any = r.get(r.fieldIndex(name))
    val out = target.flatMap { c =>
      val base = Seq(
        (c, "count", d(row, "__n")),
        (c, "n_nulls", d(row, s"__nulls_$c"))) ++
        (if (hllable.contains(c))
          Seq((c, "approx_distinct", distincts.getOrElse(c, null)))
        else Nil)
      val num = if (!numeric.contains(c)) Nil else Seq(
        (c, "min", d(row, s"__min_$c")),
        (c, "max", d(row, s"__max_$c")),
        (c, "q25", d(qRow, s"__q25_$c")),
        (c, "q50", d(qRow, s"__q50_$c")),
        (c, "q75", d(qRow, s"__q75_$c")))
      base ++ num
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.map(t =>
        Row(t._1, t._2, t._3)), 1),
      StructType(Seq(StructField("column", StringType, nullable = false),
        StructField("metric", StringType, nullable = false),
        StructField("value", DoubleType, nullable = true))))
  }

  /** The DuckDB mirror: identical census, HLL registers, sample
    * membership and quantiles, UNION ALL'd into the same tall frame.
    * Column types must be passed (the SQL side can't reflect).
    */
  def datasetSql(src: String, keySql: String, target: Seq[String],
      numeric: Seq[String], hllable: Seq[String],
      p: Int = 12, k: Int = 4096): String = {
    val censusSelects = target.flatMap { c =>
      Seq(
        s"SELECT '$c' AS \"column\", 'count' AS metric, CAST(count(*) AS DOUBLE) AS value FROM $src",
        s"SELECT '$c', 'n_nulls', CAST(count(*) - count($c) AS DOUBLE) FROM $src") ++
        (if (numeric.contains(c)) Seq(
          s"SELECT '$c', 'min', CAST(min($c) AS DOUBLE) FROM $src",
          s"SELECT '$c', 'max', CAST(max($c) AS DOUBLE) FROM $src")
        else Nil)
    }
    val hllBlocks = hllable.map { c =>
      // a constant group key keeps the shared Hll mirror's GROUP BY shape
      val inner = Hll.approxDistinctSql(
        s"(SELECT 'x' AS pg, CAST($c AS VARCHAR) AS pv FROM $src) t_$c",
        Seq("pg"), "pv", p)
      s"""SELECT '$c', 'approx_distinct', approx_distinct FROM (
         |WITH $inner
         |)""".stripMargin
    }
    val h = graft.functions.OracleSql.tokenHash(s"CAST($keySql AS VARCHAR)")
    val qBlocks =
      if (numeric.isEmpty) Nil
      else {
        val qsel = numeric.flatMap(c => Seq(
          s"SELECT '$c', 'q25', quantile_cont($c, 0.25) FROM samp",
          s"SELECT '$c', 'q50', quantile_cont($c, 0.5) FROM samp",
          s"SELECT '$c', 'q75', quantile_cont($c, 0.75) FROM samp"))
        Seq(s"""SELECT * FROM (
           |WITH samp AS (
           |  SELECT * FROM (
           |    SELECT *, row_number() OVER (
           |      ORDER BY $h, CAST($keySql AS VARCHAR)) AS rn
           |    FROM $src WHERE $keySql IS NOT NULL
           |  ) WHERE rn <= $k
           |)
           |${qsel.mkString("\nUNION ALL\n")}
           |)""".stripMargin)
      }
    (censusSelects ++ hllBlocks ++ qBlocks).mkString("\nUNION ALL\n")
  }
}
