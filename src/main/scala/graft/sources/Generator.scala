package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** S3 — seedable synthetic OHLCV generator (reference
  * binance_provider.py:135-191 `_get_test_data`: random-walk close, derived
  * high/low, seeded).
  *
  * Unlike `randn(seed)` — whose values depend on partitioning — every value
  * here derives from md5(seed:symbol:i:k), so the output is bit-identical at
  * ANY parallelism and reproducible in DuckDB for oracle checks. The only
  * non-map step is the running sum for the random walk (one window per
  * symbol — single shuffle, same shape as every indicator op).
  */
object Generator {

  private val Two60 = 1152921504606846976.0 // 2^60 = tokenHash range

  /** Uniform [0,1) from the portable 60-bit hash. */
  private def u(seed: Long, symbol: Column, i: Column, k: Int): Column =
    (TextHash.tokenHash(concat_ws(":", lit(seed), symbol, i, lit(k)))
      .cast("double")) / lit(Two60)

  /** Generate `n` bars per symbol at `intervalSec` spacing from `startTs`
    * (UTC). Columns: symbol, ts, open, high, low, close, volume.
    */
  def ohlcv(spark: SparkSession, symbols: Seq[String], n: Long,
      startTs: String = "2024-01-01 00:00:00", intervalSec: Long = 60L,
      seed: Long = 42L, base: Double = 100.0): DataFrame = {
    val sym = explode(array(symbols.map(lit): _*)).as("symbol")
    val rows = spark.range(n).select(col("id").as("i"), sym)
    val w = Window.partitionBy(col("symbol")).orderBy(col("i"))
    // Irwin-Hall(4)-shaped integer step scaled by 2^-20: every step (and
    // every partial sum below 2^33 steps) is EXACTLY representable in
    // double, so the running-sum walk is bit-identical regardless of the
    // engine's summation association (Spark adds incrementally; DuckDB
    // uses a segment tree — with inexact steps they differ by 1 ulp).
    def hmod(k: Int): Column =
      TextHash.tokenHash(concat_ws(":", lit(seed), col("symbol"), col("i"), lit(k))) % lit(2001L)
    val step = (hmod(1) + hmod(2) + hmod(3) + hmod(4) - lit(4000L))
      .cast("double") / lit(1048576.0)
    rows
      .withColumn("walk", sum(step).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("close", lit(base) * (lit(1.0) + col("walk")))
      .withColumn("open",
        lag(col("close"), 1, null).over(w))
      .withColumn("open", coalesce(col("open"), lit(base)))
      .withColumn("high",
        greatest(col("open"), col("close")) *
          (lit(1.0) + u(seed, col("symbol"), col("i"), 5) * lit(0.001)))
      .withColumn("low",
        least(col("open"), col("close")) *
          (lit(1.0) - u(seed, col("symbol"), col("i"), 6) * lit(0.001)))
      .withColumn("volume", floor(u(seed, col("symbol"), col("i"), 7) * lit(1000.0)) + lit(1.0))
      .withColumn("ts", {
        // TIMESTAMP_NTZ is not castable to BIGINT in Spark 4; derive the
        // start epoch driver-side (wall-clock == UTC; session TZ is UTC).
        val startEpoch = java.time.LocalDateTime
          .parse(startTs.replace(' ', 'T'))
          .toEpochSecond(java.time.ZoneOffset.UTC)
        timestamp_seconds(lit(startEpoch) + col("i") * lit(intervalSec))
          .cast("timestamp_ntz")
      })
      .select("symbol", "ts", "open", "high", "low", "close", "volume")
  }

  /** Deterministic clustered unit vectors for ANN evaluation: `nClusters`
    * gaussian centers, each vector = center + `noise`·gaussian perturbation,
    * L2-normalized. Real embedding corpora are clustered — the uniform
    * sphere the `embeddings` fixture approximates is ANN's WORST case
    * (nearest-centroid pruning carries no information when every direction
    * is equally likely), so recall dials need both fixtures: uniform as the
    * lower bound, clustered as the regime IVF/PQ are built for.
    *
    * Every coordinate derives from md5(seed:tag:dim) through Box–Muller, so
    * the output is bit-identical at any parallelism (same discipline as
    * [[ohlcv]]); there is no shuffle at all — pure map over `spark.range`.
    * `noise` sets the intra/inter-cluster separation: 0 collapses each
    * cluster to its center, large values degrade toward the uniform sphere.
    */
  def clusteredEmbeddings(spark: SparkSession, n: Long, dims: Int = 64,
      nClusters: Int = 32, noise: Double = 0.25, seed: Long = 42L): DataFrame = {
    def uh(tag: Column, k: Int): Column =
      (TextHash.tokenHash(concat_ws(":", lit(seed), tag, lit(k)))
        .cast("double") + lit(1.0)) / lit(Two60)
    def gauss(tag: Column): Column =
      sqrt(lit(-2.0) * log(uh(tag, 0))) * cos(lit(2.0 * math.Pi) * uh(tag, 1))
    spark.range(n).select(col("id").as("vec_id"))
      .withColumn("cluster", (col("vec_id") % nClusters).cast("int"))
      .withColumn("raw", transform(sequence(lit(0), lit(dims - 1)), d =>
        gauss(concat_ws(":", lit("c"), col("cluster"), d)) +
          lit(noise) * gauss(concat_ws(":", lit("v"), col("vec_id"), d))))
      .withColumn("inv",
        lit(1.0) / sqrt(aggregate(col("raw"), lit(0.0), (acc, x) => acc + x * x)))
      .select(col("vec_id"),
        transform(col("raw"), x => (x * col("inv")).cast("float")).as("embedding"),
        concat(lit("cl_"), col("cluster")).as("label"))
  }

  /** DuckDB mirror of [[ohlcv]] as a CTE named `gen` — same md5-derived
    * uniforms, same running-sum walk, same expression shapes.
    */
  def ohlcvSql(symbols: Seq[String], n: Long,
      startTs: String = "2024-01-01 00:00:00", intervalSec: Long = 60L,
      seed: Long = 42L, base: Double = 100.0): String = {
    val symList = symbols.map(s => s"'$s'").mkString("[", ", ", "]")
    def uSql(k: Int) =
      s"CAST(CAST(concat('0x', substr(md5(concat_ws(':', $seed, symbol, i, $k)), 1, 15)) AS BIGINT) AS DOUBLE) / 1152921504606846976.0"
    def hmodSql(k: Int) =
      s"CAST(concat('0x', substr(md5(concat_ws(':', $seed, symbol, i, $k)), 1, 15)) AS BIGINT) % 2001"
    s"""WITH base_rows AS (
       |  SELECT unnest($symList) AS symbol, i
       |  FROM generate_series(0, ${n - 1}) t(i)
       |), walked AS (
       |  SELECT symbol, i,
       |         sum(CAST(${hmodSql(1)} + ${hmodSql(2)} + ${hmodSql(3)} + ${hmodSql(4)} - 4000 AS DOUBLE) / 1048576.0)
       |           OVER (PARTITION BY symbol ORDER BY i
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS walk,
       |         ${uSql(5)} AS u5, ${uSql(6)} AS u6, ${uSql(7)} AS u7
       |  FROM base_rows
       |), priced AS (
       |  SELECT symbol, i, u5, u6, u7,
       |         $base * (1.0 + walk) AS close,
       |         coalesce(lag($base * (1.0 + walk), 1) OVER (PARTITION BY symbol ORDER BY i), $base) AS open
       |  FROM walked
       |), gen AS (
       |  SELECT symbol,
       |         TIMESTAMP '$startTs' + to_seconds(i * $intervalSec) AS ts,
       |         open,
       |         greatest(open, close) * (1.0 + u5 * 0.001) AS high,
       |         least(open, close) * (1.0 - u6 * 0.001) AS low,
       |         close,
       |         floor(u7 * 1000.0) + 1.0 AS volume
       |  FROM priced
       |)""".stripMargin
  }
}
