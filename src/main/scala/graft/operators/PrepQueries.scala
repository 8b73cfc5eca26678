package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{OracleSql => O}
import graft.sources.Tables
import QueryFixtures.{dbars, dbarsSql}

/** Declared-query catalog for SURVEY §2.7: normalization (N1-N3),
  * train/test splits (P1-P5), and the beyond-reference training-prep
  * ops — token-budget packing (P6), stratified sampling (P7), and
  * shuffled-shard export labels (P8).
  * Expression trees mirror the DuckDB oracles (exact decimal moments;
  * splits/packing/sampling are integer/row_number arithmetic).
  */
object PrepQueries {

  private val normCols = Seq("open", "volume")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "n1_zscore" -> ((s, dir) =>
      Normalize.finish(
        Normalize.zscoreTransform(Normalize.zscoreFit(dbars(s, dir), normCols), normCols))
        .select(col("event_id"), col("open").as("z_open"), col("volume").as("z_volume"))),
    "n2_minmax" -> ((s, dir) =>
      Normalize.finish(
        Normalize.minmaxTransform(Normalize.minmaxFit(dbars(s, dir), normCols), normCols))
        .select(col("event_id"), col("open").as("mm_open"), col("volume").as("mm_volume"))),
    "n3_log" -> ((s, dir) =>
      Normalize.logTransform(
        Cleaning.filterNonNegative(dbars(s, dir), Seq("volume")), Seq("volume"))
        .select(col("event_id"), col("volume").as("log_volume"))),
    "p1_chrono_split" -> ((s, dir) =>
      Split.chronological(dbars(s, dir), Seq(col("ts"), col("event_id")),
          Seq(0.8), Seq("train", "test"))
        .groupBy("symbol", "split").agg(count(lit(1)).as("n"))),
    // P1's 100 TB-safe variant, oracle-gated: rank-based cut timestamps +
    // pure filter labels — no global row_number sort over the data.
    "p1b_chrono_split_scale" -> ((s, dir) =>
      Split.chronologicalAtScale(dbars(s, dir), col("ts"),
          Seq(0.8), Seq("train", "test"), exact = true)
        .groupBy("symbol", "split").agg(count(lit(1)).as("n"))),
    "p3_three_way_split" -> ((s, dir) =>
      Split.chronological(dbars(s, dir), Seq(col("ts"), col("event_id")),
          Seq(0.7, 0.85), Seq("train", "val", "test"))
        .select(col("event_id"), col("split"))),
    "p4_split_by_date" -> ((s, dir) =>
      Split.splitByDate(dbars(s, dir), col("ts"),
          Seq("2024-01-10 00:00:00", "2024-01-20 00:00:00"),
          Seq("train", "val", "test"))
        .select(col("event_id"), col("split"))),
    "p2_hash_split" -> ((s, dir) =>
      Split.hashSplit(dbars(s, dir), col("event_id"), 0.8)
        .groupBy("split").agg(count(lit(1)).as("n"))),
    // P6 (beyond-reference) — token-budget packing: per-source prefix bins
    // over the documents corpus, the shard-assignment step of an LLM
    // training pipeline. Pure integer window arithmetic, one exchange.
    "p6_token_packing" -> ((s, dir) =>
      Split.packByTokenBudget(
          Tables.documents(s, dir).select(col("doc_id"), col("source"),
            TextOps.tokenCount(col("text")).as("n_tokens")),
          Seq(col("source")), Seq(col("doc_id")), col("n_tokens"), budget = 256L)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("bin_id"), col("bin_offset"))),
    // P6 at scale — the distributed two-phase chunked prefix, bit-equal
    // to p6 by construction (same oracle SQL): local prefix within each
    // (source, doc_id DIV 64) chunk + broadcast cumulative chunk offsets.
    "p6b_token_packing_scale" -> ((s, dir) =>
      Split.packByTokenBudgetChunked(
          Tables.documents(s, dir).select(col("doc_id"), col("source"),
            TextOps.tokenCount(col("text")).as("n_tokens")),
          Seq(col("source")), Seq(col("doc_id")), expr("doc_id DIV 64"),
          col("n_tokens"), budget = 256L)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("bin_id"), col("bin_offset"))),
    // P7 (beyond-reference) — deterministic stratified sampling: domain
    // mixture reweighting as a pure row-local filter (no shuffle).
    "p7_stratified_sample" -> ((s, dir) =>
      Split.stratifiedHashSample(Tables.documents(s, dir),
          col("doc_id"), col("source"),
          Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 1.0), defaultRate = 0.1)
        .select(col("doc_id"), col("source"))),
    // P8 (beyond-reference) — deterministic shuffled-shard export labels:
    // reproducible global shuffle + shard assignment for training order.
    "p8_shuffled_shards" -> ((s, dir) =>
      Split.shuffledShards(Tables.documents(s, dir), col("doc_id"), nShards = 8)
        .select(col("doc_id"), col("shard_id"), col("pos"))),
    // MX1 (beyond-reference) — temperature-scaled source-mixture weights
    // (tokens^0.5, fixed-point-quantized so the normalizing sum is exact
    // integer arithmetic): the sampling-rate table of a multi-source run.
    "mx1_mixture_weights" -> ((s, dir) =>
      Split.mixtureWeights(
        Tables.documents(s, dir).select(col("source"),
          TextOps.tokenCount(col("text")).as("n_tok")),
        col("source"), col("n_tok"), budgetTokens = 100000L)),
    // MX2 — the weights APPLIED: per-source keep rate = min(1, epochs),
    // enforced as a deterministic row-local hash filter (broadcast rate
    // table, shuffle-free corpus pass).
    "mx2_mixture_sample" -> ((s, dir) =>
      Split.sampleToMixture(
        Tables.documents(s, dir).select(col("doc_id"), col("source"),
          TextOps.tokenCount(col("text")).as("n_tok")),
        col("doc_id"), col("source"), col("n_tok"), budgetTokens = 30000L)
        .select(col("doc_id"), col("source"))),
    "p5_sliding_windows" -> ((s, dir) => {
      // Declared output is exploded to (part, idx, value) rows: the driver's
      // canonicalizer sorts every column and cannot hash raw array cells.
      val w = Split.slidingWindows(
        dbars(s, dir).filter(col("symbol") === "click"),
        Seq(col("symbol")), Seq(col("ts"), col("event_id")),
        col("close"), window = 8, target = 2, stride = 4)
      // one evaluation, not one per part-arm (same shape as p5b below)
      val arms = Seq("x", "y").map(p =>
        struct(lit(p).as("part"), col(p).as("arr")))
      w.select(col("event_id"),
          col("window_start_rn").cast("long").as("window_start_rn"),
          explode(array(arms: _*)).as("e"))
        .select(col("event_id"), col("window_start_rn"),
          col("e.part").as("part"), posexplode(col("e.arr")))
        .select(col("event_id"), col("window_start_rn"), col("part"),
          col("pos").cast("long").as("idx"), col("col").as("value"))
    }),
    "p5b_sliding_windows_multi" -> ((s, dir) => {
      // Multi-feature tensor windows (n, window, features), exploded to
      // (part, feature, idx, value) scalar rows for the driver's hasher.
      val feats = Seq("open", "close", "volume")
      val w = Split.slidingWindowsMulti(
        dbars(s, dir).filter(col("symbol") === "click"),
        Seq(col("symbol")), Seq(col("ts"), col("event_id")),
        feats, window = 8, target = 2, stride = 4)
      // single pass: a six-way unionByName of per-(part, feature) selects
      // re-evaluated the whole window pipeline once per arm (6 scans /
      // 116 operators); exploding a built (part, feature, array) struct
      // array flattens the same multiset of rows from ONE evaluation
      val arms = for (p <- Seq("x", "y"); f <- feats) yield
        struct(lit(p).as("part"), lit(f).as("feature"),
          col(s"${p}_$f").as("arr"))
      w.select(col("event_id"),
          col("window_start_rn").cast("long").as("window_start_rn"),
          explode(array(arms: _*)).as("e"))
        .select(col("event_id"), col("window_start_rn"),
          col("e.part").as("part"), col("e.feature").as("feature"),
          posexplode(col("e.arr")))
        .select(col("event_id"), col("window_start_rn"), col("part"),
          col("feature"), col("pos").cast("long").as("idx"),
          col("col").as("value"))
    })
  )

  private val statsCte =
    s""", st AS (
       |  SELECT ${O.exactAvg("open")} AS mu_open, ${O.exactStdSamp("open")} AS sd_open,
       |         ${O.exactAvg("volume")} AS mu_volume, ${O.exactStdSamp("volume")} AS sd_volume,
       |         min(open) AS mn_open, max(open) AS mx_open,
       |         min(volume) AS mn_volume, max(volume) AS mx_volume
       |  FROM dbars
       |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "n1_zscore" -> (dbarsSql + statsCte +
      """
        |SELECT event_id, (open - mu_open) / sd_open AS z_open,
        |       (volume - mu_volume) / sd_volume AS z_volume
        |FROM dbars CROSS JOIN st""".stripMargin),
    "n2_minmax" -> (dbarsSql + statsCte +
      """
        |SELECT event_id, (open - mn_open) / (mx_open - mn_open) AS mm_open,
        |       (volume - mn_volume) / (mx_volume - mn_volume) AS mm_volume
        |FROM dbars CROSS JOIN st""".stripMargin),
    "n3_log" -> (dbarsSql +
      """
        |SELECT event_id, ln(CAST(1 AS DOUBLE) + volume) AS log_volume
        |FROM dbars
        |WHERE volume IS NULL OR volume >= 0""".stripMargin),
    "p1_chrono_split" -> (dbarsSql +
      """, lab AS (
        |  SELECT symbol,
        |         CASE WHEN row_number() OVER (ORDER BY ts, event_id)
        |                   <= floor(count(*) OVER () * CAST('0.8' AS DOUBLE)) THEN 'train' ELSE 'test' END AS split
        |  FROM dbars
        |)
        |SELECT symbol, split, count(*) AS n FROM lab GROUP BY symbol, split""".stripMargin),
    "p1b_chrono_split_scale" -> (dbarsSql +
      """, tot AS (
        |  SELECT CAST(floor(count(*) * CAST('0.8' AS DOUBLE)) AS BIGINT) AS k FROM dbars
        |), pt AS (
        |  SELECT epoch_us(ts) AS tus, count(*) AS c FROM dbars GROUP BY 1
        |), cc AS (
        |  SELECT tus, sum(c) OVER (ORDER BY tus) AS cum FROM pt
        |), q AS (
        |  SELECT min(CASE WHEN cum >= k THEN tus END) AS cut FROM cc CROSS JOIN tot
        |), lab AS (
        |  SELECT symbol,
        |         CASE WHEN epoch_us(ts) <= cut THEN 'train' ELSE 'test' END AS split
        |  FROM dbars CROSS JOIN q
        |)
        |SELECT symbol, split, count(*) AS n FROM lab GROUP BY symbol, split""".stripMargin),
    "p3_three_way_split" -> (dbarsSql +
      """
        |SELECT event_id,
        |       CASE WHEN rn <= floor(n * CAST('0.7' AS DOUBLE)) THEN 'train'
        |            WHEN rn <= floor(n * CAST('0.85' AS DOUBLE)) THEN 'val'
        |            ELSE 'test' END AS split
        |FROM (SELECT event_id, row_number() OVER (ORDER BY ts, event_id) AS rn,
        |             count(*) OVER () AS n
        |      FROM dbars)""".stripMargin),
    "p4_split_by_date" -> (dbarsSql +
      """
        |SELECT event_id,
        |       CASE WHEN ts <= TIMESTAMP '2024-01-10 00:00:00' THEN 'train'
        |            WHEN ts <= TIMESTAMP '2024-01-20 00:00:00' THEN 'val'
        |            ELSE 'test' END AS split
        |FROM dbars""".stripMargin),
    "p2_hash_split" -> (dbarsSql +
      """
        |SELECT CASE WHEN (event_id * 2654435761) % 4294967296 < 3435973836 THEN 'train'
        |            ELSE 'test' END AS split,
        |       count(*) AS n
        |FROM dbars GROUP BY 1""".stripMargin),
    "p6_token_packing" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source,
         |         CAST(len(${O.tokens("text")}) AS INTEGER) AS n_tokens
         |  FROM documents
         |), pre AS (
         |  SELECT doc_id, source, n_tokens,
         |         CAST(COALESCE(SUM(n_tokens) OVER (
         |           PARTITION BY source ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pb
         |  FROM toks
         |)
         |SELECT doc_id, source, n_tokens,
         |       pb // 256 AS bin_id, pb % 256 AS bin_offset
         |FROM pre""".stripMargin,
    // p6b is the chunked two-phase computation of the SAME labels — one
    // oracle, two physical plans.
    "p6b_token_packing_scale" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source,
         |         CAST(len(${O.tokens("text")}) AS INTEGER) AS n_tokens
         |  FROM documents
         |), pre AS (
         |  SELECT doc_id, source, n_tokens,
         |         CAST(COALESCE(SUM(n_tokens) OVER (
         |           PARTITION BY source ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pb
         |  FROM toks
         |)
         |SELECT doc_id, source, n_tokens,
         |       pb // 256 AS bin_id, pb % 256 AS bin_offset
         |FROM pre""".stripMargin,
    // The hash oracles mirror Spark's pmod with an explicit floorMod wrap
    // (plain `%` keeps the dividend's sign in DuckDB, diverging on
    // negative keys). Key-domain assumption next to the maths: the
    // 64-bit product must not overflow — |doc_id| < 2^63/PRIME ≈ 4.1e9 —
    // else DuckDB raises where Spark wraps (PropertySpec pins the Spark
    // side against a floorMod reference over negative keys too).
    "p7_stratified_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE ((doc_id * 2246822519) % 4294967296 + 4294967296) % 4294967296 <
        |      CASE source WHEN 'src0' THEN 2147483648
        |                  WHEN 'src1' THEN 1073741824
        |                  WHEN 'src2' THEN 4294967296
        |                  ELSE 429496730 END""".stripMargin,
    // Every emitted double is one IEEE op on exact integers (sqrt is
    // correctly rounded; the quantized weights sum exactly), so the
    // hash-match holds engine-to-engine — see Split.mixtureWeights.
    "mx1_mixture_weights" ->
      s"""WITH toks AS (
         |  SELECT source, CAST(len(${O.tokens("text")}) AS BIGINT) AS n_tok
         |  FROM documents
         |), ps AS (
         |  SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |  FROM toks GROUP BY 1
         |), w AS (
         |  SELECT source, n_docs, n_tokens,
         |         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_fixed
         |  FROM ps
         |), tot AS (SELECT CAST(sum(w_fixed) AS BIGINT) AS wt FROM w)
         |SELECT source, n_docs, n_tokens, w_fixed,
         |       CAST(w_fixed AS DOUBLE) / CAST(wt AS DOUBLE) AS weight,
         |       (CAST(w_fixed AS DOUBLE) / CAST(wt AS DOUBLE)) * CAST(100000 AS DOUBLE) AS expected_tokens,
         |       ((CAST(w_fixed AS DOUBLE) / CAST(wt AS DOUBLE)) * CAST(100000 AS DOUBLE)) / CAST(n_tokens AS DOUBLE) AS epochs
         |FROM w CROSS JOIN tot""".stripMargin,
    "mx2_mixture_sample" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source, CAST(len(${O.tokens("text")}) AS BIGINT) AS n_tok
         |  FROM documents
         |), ps AS (
         |  SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |  FROM toks GROUP BY 1
         |), w AS (
         |  SELECT source, n_tokens,
         |         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_fixed
         |  FROM ps
         |), tot AS (SELECT CAST(sum(w_fixed) AS BIGINT) AS wt FROM w),
         |rates AS (
         |  SELECT source,
         |         CAST(floor(least(CAST(1 AS DOUBLE),
         |           ((CAST(w_fixed AS DOUBLE) / CAST(wt AS DOUBLE)) * CAST(30000 AS DOUBLE))
         |             / CAST(n_tokens AS DOUBLE)) * 4294967296.0) AS BIGINT) AS thresh
         |  FROM w CROSS JOIN tot
         |)
         |SELECT doc_id, source FROM toks JOIN rates USING (source)
         |WHERE ((doc_id * 668265263) % 4294967296 + 4294967296) % 4294967296 < thresh""".stripMargin,
    "p8_shuffled_shards" ->
      """WITH h AS (
        |  SELECT doc_id,
        |         ((doc_id * 3266489917) % 4294967296 + 4294967296) % 4294967296 AS hv
        |  FROM documents
        |)
        |SELECT doc_id, CAST(hv % 8 AS INTEGER) AS shard_id,
        |       CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id)
        |            AS INTEGER) AS pos
        |FROM h""".stripMargin,
    "p5_sliding_windows" -> (dbarsSql +
      """, s AS (
        |  SELECT event_id,
        |         row_number() OVER w AS rn,
        |         list(close) OVER (w ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING) AS vals
        |  FROM dbars WHERE symbol = 'click'
        |  WINDOW w AS (PARTITION BY symbol ORDER BY ts, event_id)
        |), win AS (
        |  SELECT event_id, rn AS window_start_rn, vals[1:8] AS x, vals[9:10] AS y
        |  FROM s WHERE len(vals) = 10 AND (rn - 1) % 4 = 0
        |)
        |SELECT event_id, window_start_rn, 'x' AS part,
        |       CAST(i - 1 AS BIGINT) AS idx, x[i] AS value
        |FROM win CROSS JOIN generate_series(1, 8) g(i)
        |UNION ALL
        |SELECT event_id, window_start_rn, 'y' AS part,
        |       CAST(i - 1 AS BIGINT) AS idx, y[i] AS value
        |FROM win CROSS JOIN generate_series(1, 2) g(i)""".stripMargin),
    "p5b_sliding_windows_multi" -> (dbarsSql +
      """, s AS (
        |  SELECT event_id,
        |         row_number() OVER w AS rn,
        |         list(open)   OVER (w ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING) AS lo,
        |         list(close)  OVER (w ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING) AS lc,
        |         list(volume) OVER (w ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING) AS lv
        |  FROM dbars WHERE symbol = 'click'
        |  WINDOW w AS (PARTITION BY symbol ORDER BY ts, event_id)
        |), win AS (
        |  SELECT event_id, rn AS window_start_rn,
        |         lo[1:8] AS x_open,   lo[9:10] AS y_open,
        |         lc[1:8] AS x_close,  lc[9:10] AS y_close,
        |         lv[1:8] AS x_volume, lv[9:10] AS y_volume
        |  FROM s WHERE len(lc) = 10 AND (rn - 1) % 4 = 0
        |), xarm AS (
        |  SELECT event_id, window_start_rn, 'x' AS part, f.feature,
        |         CAST(i - 1 AS BIGINT) AS idx,
        |         CASE f.feature WHEN 'open' THEN x_open[i]
        |                        WHEN 'close' THEN x_close[i]
        |                        ELSE x_volume[i] END AS value
        |  FROM win
        |  CROSS JOIN (VALUES ('open'), ('close'), ('volume')) f(feature)
        |  CROSS JOIN generate_series(1, 8) g(i)
        |), yarm AS (
        |  SELECT event_id, window_start_rn, 'y' AS part, f.feature,
        |         CAST(i - 1 AS BIGINT) AS idx,
        |         CASE f.feature WHEN 'open' THEN y_open[i]
        |                        WHEN 'close' THEN y_close[i]
        |                        ELSE y_volume[i] END AS value
        |  FROM win
        |  CROSS JOIN (VALUES ('open'), ('close'), ('volume')) f(feature)
        |  CROSS JOIN generate_series(1, 2) g(i)
        |)
        |SELECT * FROM xarm UNION ALL SELECT * FROM yarm""".stripMargin)
  )
}
