package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.plans.GraftFunctions

class SkewAndSqlSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct aggregation on a skewed key") {
    // 90% of rows on one hot key
    val df = (1 to 10000).map { i =>
      (if (i % 10 == 0) s"cold${i % 97}" else "HOT", i.toLong, i * 0.5)
    }.toDF("k", "id", "v")
    val direct = df.groupBy("k").agg(
      count(lit(1)).as("n"),
      sum(col("v").cast("decimal(38,10)")).cast("double").as("sum"),
      min("v").as("min"), max("v").as("max"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Skew.saltedStats(df, col("k"), col("id"), col("v"), buckets = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted == direct)
    // and the salt actually spreads the hot key
    val spread = df.withColumn("__salt", Skew.salt(col("id"), 8))
      .filter(col("k") === "HOT").select("__salt").distinct().count()
    assert(spread == 8)
  }

  test("chunked finite indicators are bit-equal to the plain per-symbol window") {
    import graft.operators.Indicators
    // 2 symbols x 2500 minutes spanning many 6-hour chunks; values from the
    // deterministic generator so decimal frames are exercised realistically
    val bars = graft.sources.Generator.ohlcv(spark, Seq("hot", "cold"), 2500L)
    val chunk = floor(unix_micros(col("ts").cast("timestamp")) / lit(6L * 3600 * 1000000))
    val cols = Seq("symbol", "ts", "sma_20", "sma_50", "sma_200", "bb_middle",
      "bb_upper", "bb_lower", "rsi_14", "atr_14")

    val plain = Skew.finiteIndicators(bars,
        Indicators.Series(Seq(col("symbol")), Seq(col("ts"))))
      .select(cols.map(col): _*).collect().map(_.toString).sorted
    val chunked = Skew.chunkedFiniteIndicators(bars, Seq(col("symbol")),
        Seq(col("ts")), chunk)
      .select(cols.map(col): _*).collect().map(_.toString).sorted
    assert(chunked.length == plain.length)
    assert(chunked.sameElements(plain)) // bit-identical, incl. null gating

    // an UNDERSIZED halo must differ (proves the halo is doing the work:
    // sma_200 needs 200 rows of replayed context, 10 is not enough)
    val tooSmall = Skew.chunkedFiniteIndicators(bars, Seq(col("symbol")),
        Seq(col("ts")), chunk, halo = 10)
      .select(cols.map(col): _*).collect().map(_.toString).sorted
    assert(!tooSmall.sameElements(plain))

    // the window really is partitioned by (symbol, chunk) — the hot
    // symbol's series is split across window partitions
    val plan = Skew.chunkedFiniteIndicators(bars, Seq(col("symbol")),
        Seq(col("ts")), chunk).queryExecution.executedPlan.toString
    assert(plan.contains("__chunk"))
  }

  test("chunked indicators survive EMPTY and SHORT chunks (halo spans back)") {
    import graft.operators.Indicators
    // A series with (a) a chunk that has NO rows — the generator's minutes
    // filtered out for one whole chunk — and (b) chunks SHORTER than the
    // halo, so warm-up context must span SEVERAL preceding chunks. A naive
    // carry into chunk+1 loses the halo at the gap, and a carry from only
    // the adjacent chunk loses the tail beyond it.
    val minutes = graft.sources.Generator.ohlcv(spark, Seq("hot", "cold"), 3000L)
    // hour index relative to the generator's 2024-01-01 start: 60-row
    // chunks, FAR smaller than the 201-row halo
    val chunkExpr = floor(
      (unix_micros(col("ts").cast("timestamp")) / lit(1000000L) - lit(1704067200L)) /
        lit(3600L))
    // drop hour 2 entirely (a whole empty chunk per symbol), and thin
    // hour 5 down to its first 7 rows
    val fromStart = org.apache.spark.sql.expressions.Window
      .partitionBy(col("symbol"), chunkExpr).orderBy(col("ts"))
    val bars = minutes
      .withColumn("__pos", row_number().over(fromStart))
      .filter(chunkExpr =!= 2)
      .filter(!(chunkExpr === 5) || col("__pos") <= 7)
      .drop("__pos")
    val cols = Seq("symbol", "ts", "sma_20", "sma_50", "sma_200", "bb_middle",
      "bb_upper", "bb_lower", "rsi_14", "atr_14")
    val plain = Skew.finiteIndicators(bars,
        Indicators.Series(Seq(col("symbol")), Seq(col("ts"))))
      .select(cols.map(col): _*).collect().map(_.toString).sorted
    val chunked = Skew.chunkedFiniteIndicators(bars, Seq(col("symbol")),
        Seq(col("ts")), chunkExpr)
      .select(cols.map(col): _*).collect().map(_.toString).sorted
    assert(chunked.length == plain.length)
    assert(chunked.sameElements(plain))
  }

  test("chunked EMA/MACD meets its error bound; undersized halo diverges") {
    import graft.operators.Indicators
    // 2 symbols x 4000 minutes; 6-hour (360-row) chunks, SMALLER than the
    // default 720-row halo, so warm-up context must span chunks
    val bars = graft.sources.Generator.ohlcv(spark, Seq("hot", "cold"), 4000L)
    val chunk = floor(unix_micros(col("ts").cast("timestamp")) / lit(6L * 3600 * 1000000))
    val emaCols = Seq("ema_12", "ema_26", "macd", "macd_signal", "macd_hist")

    def byKey(df: org.apache.spark.sql.DataFrame): Map[(String, Any), Seq[Double]] =
      df.select((Seq("symbol", "ts") ++ emaCols).map(col): _*).collect()
        .map(r => (r.getString(0), r.get(1)) -> emaCols.indices.map(i => r.getDouble(2 + i)))
        .toMap

    val plain = byKey(Skew.emaMacd(bars,
      Indicators.Series(Seq(col("symbol")), Seq(col("ts")))))
    val chunked = byKey(Skew.chunkedEmaMacd(bars, Seq(col("symbol")),
      Seq(col("ts")), chunk))
    assert(chunked.keySet == plain.keySet)

    val range = {
      val r = bars.agg(max("close") - min("close")).collect()(0).getDouble(0)
      math.max(r, 1.0)
    }
    def maxErr(m: Map[(String, Any), Seq[Double]]): Double =
      m.map { case (k, vs) =>
        vs.zip(plain(k)).map { case (a, b) => math.abs(a - b) }.max
      }.max

    // documented bound: within tol x range of the exact per-symbol window
    val err = maxErr(chunked)
    info(f"chunked EMA/MACD max abs error at default halo: $err%.3e (range $range%.1f)")
    assert(err <= 1e-9 * range, f"error $err%.3e exceeds bound")

    // the halo is doing the work: a 20-row warm-up leaves visible error
    val tooSmall = byKey(Skew.chunkedEmaMacd(bars, Seq(col("symbol")),
      Seq(col("ts")), chunk, halo = 20))
    assert(maxErr(tooSmall) > 1e-6 * range)

    // and the halo calculator matches the closed form it documents
    assert(Skew.emaHalo(26) == 360)
    assert(math.pow(1.0 - 2.0 / 27, Skew.emaHalo(26, 1e-12).toDouble) <= 1e-12)
  }

  test("ema and jlog are callable from SQL after registration") {
    GraftFunctions.register(spark)
    Seq(("s", 1L, 10.0), ("s", 2L, 20.0), ("s", 3L, 30.0))
      .toDF("symbol", "t", "x").createOrReplaceTempView("sql_bars")
    val rows = spark.sql(
      """SELECT t, ema(x, 0.5) OVER (PARTITION BY symbol ORDER BY t) AS e,
        |       jlog(x) AS l
        |FROM sql_bars ORDER BY t""".stripMargin).collect()
    assert(rows.map(_.getDouble(1)).toSeq == Seq(10.0, 15.0, 22.5))
    assert(rows.head.getDouble(2) == math.log(10.0))
  }

  test("top_k is callable from SQL; agrees with the window formulation") {
    GraftFunctions.register(spark)
    (1 to 200).map(i => (i % 4L, (i % 9).toDouble, i.toLong))
      .toDF("q", "score", "id").createOrReplaceTempView("sql_scored")
    val viaAgg = spark.sql(
      """SELECT q, pos + 1 AS rank, col.id AS id, col.score AS score
        |FROM (SELECT q, top_k(score, id, 5) AS t FROM sql_scored GROUP BY q)
        |LATERAL VIEW posexplode(t) AS pos, col""".stripMargin)
      .collect().map(_.toString).sorted
    val viaWin = spark.sql(
      """SELECT q, CAST(rank AS BIGINT) AS rank, id, score FROM (
        |  SELECT q, id, score,
        |         row_number() OVER (PARTITION BY q ORDER BY score DESC, id) AS rank
        |  FROM sql_scored) WHERE rank <= 5""".stripMargin)
      .collect().map(_.toString).sorted
    assert(viaAgg.sameElements(viaWin))
  }
}
