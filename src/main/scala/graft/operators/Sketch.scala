package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Mergeable bottom-k hash samples (the KMV idea row-wise) — a UNIFORM
  * sample per group that composes the way sketches must at 100 TB:
  * merge(sample(A), sample(B)) == sample(A ∪ B) EXACTLY, because
  * membership is a pure function of each row's key hash (the k smallest
  * hashes win, ties broken by the key string) — no RNG, no seed
  * coordination, bit-identical on every engine that can md5. That makes
  * the sample INCREMENTAL (re-trim yesterday's sample + today's batch),
  * ROLLUP-ABLE (fine-group samples re-trim into coarse groups), and
  * oracle-replayable (a ROW_NUMBER window in SQL).
  *
  * The quantile estimator is then just the exact `percentile` over the
  * sample — rank error is the classic O(1/√k) (k=4096 ⇒ ~1.6 % rank
  * error), asserted as floors in SketchSpec. This complements [[Hll]]:
  * HLL answers "how many distinct", the bottom-k sample answers "what
  * does the distribution look like" — the two sketch classes a
  * pre-aggregated rollup cannot serve exactly.
  *
  * Scale shape: trimming is TWO salted windows, not one — a single
  * `row_number over (partition by group)` sends every hot group to one
  * reducer; phase 1 trims to k within each of 256 hash salts (parallel
  * across salt × group), phase 2 trims the ≤256·k survivors per group.
  * Phase 1 can only keep a superset of the global bottom-k, so the
  * result is IDENTICAL to the one-window form (SketchSpec asserts it).
  */
object Sketch {

  private val Salts = 256

  /** The deterministic sample key: hash + the key's string form as the
    * total-order tie-break (md5 collisions exist in principle; the pair
    * is a total order on distinct keys).
    */
  private def keyed(df: DataFrame, key: Column): DataFrame =
    df.withColumn("__ks", key.cast("string"))
      .withColumn("__hk", TextHash.tokenHash(col("__ks")))

  private def trim(df: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val g = groupCols.map(col)
    val w1 = Window.partitionBy(g :+ pmod(col("__hk"), lit(Salts)): _*)
      .orderBy(col("__hk"), col("__ks"))
    val w2 = Window.partitionBy(g: _*).orderBy(col("__hk"), col("__ks"))
    df.withColumn("__rn", row_number().over(w1)).filter(col("__rn") <= k)
      .withColumn("__rn", row_number().over(w2)).filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Per-group bottom-k sample: all original columns plus the sample key
    * (`__hk`, `__ks` — kept so merges re-trim without recomputing).
    * `key` must be unique per row within its group (a row id); NULL keys
    * are excluded.
    */
  def sampleBottomK(df: DataFrame, groupCols: Seq[String], key: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    trim(keyed(df.filter(key.isNotNull), key), groupCols, k)
  }

  /** Merge two samples of the SAME k: union, dedup re-delivered rows (a
    * replayed batch contributes identical rows — idempotent), re-trim.
    * merge(sample(A), sample(B)) == sample(A ∪ B) exactly.
    */
  def mergeSamples(a: DataFrame, b: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame =
    trim(a.unionByName(b).dropDuplicates(groupCols :+ "__ks"),
      groupCols, k)

  /** Exact percentiles OF THE SAMPLE per group (the estimator): one row
    * per group with `q_<idx>` columns in `qs` order. Spark `percentile`
    * == DuckDB `quantile_cont` bit-for-bit (the o1/o2 gate parity).
    */
  def quantiles(sample: DataFrame, groupCols: Seq[String], value: Column,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      s"quantiles must be in [0,1], got $qs")
    val aggs = qs.zipWithIndex.map { case (q, i) =>
      percentile(value, lit(q)).as(s"q_$i")
    }
    sample.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** One-shot grouped sample quantiles. */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], key: Column,
      value: Column, k: Int, qs: Seq[Double]): DataFrame =
    quantiles(sampleBottomK(df, groupCols, key, k), groupCols, value, qs)

  /** STREAMING sample maintenance: a `foreachBatch` handler that folds
    * each micro-batch into a snapshot-lake bottom-k sample per group.
    * Like [[graft.operators.Hll.registerStream]], the fold is naturally
    * IDEMPOTENT — membership is a pure hash function and
    * [[mergeSamples]] dedups re-delivered rows before re-trimming — so
    * replayed batches converge to the identical sample with zero
    * batch-id bookkeeping. The lake then serves [[quantiles]] (or any
    * profiling read) live or time-traveled; the stored sample is ≤ k
    * rows per group regardless of stream volume.
    */
  def sampleStream(root: String, groupCols: Seq[String], key: Column,
      k: Int): (DataFrame, Long) => Unit = { (df, _) =>
    import graft.sinks.SnapshotLake
    val spark = df.sparkSession
    val batch = sampleBottomK(df, groupCols, key, k)
    if (SnapshotLake.latestVersion(spark, root).isEmpty)
      SnapshotLake.append(spark, root, batch)
    else
      // the maintained state is ≤ k rows/group: recompute the whole
      // sample (old state ∪ batch, re-trimmed) and swap it in with ONE
      // atomic replace commit — no delete+append torn window, and a
      // replayed batch re-derives the identical sample
      SnapshotLake.replace(spark, root,
        mergeSamples(SnapshotLake.read(spark, root), batch, groupCols, k))
  }

  /** Heavy hitters by SAMPLE-THEN-VERIFY — deterministic two-pass
    * frequent-items: candidates = the distinct values present in the
    * bottom-k row sample (an item with share ≥ `minShare` misses a
    * k-row uniform sample with probability ≤ e^(−k·minShare) — at
    * k=4096, minShare=0.01 that is e^(−41) ≈ 10^(−18); the bound is the
    * only approximation), then EXACT counts of just those ≤k candidate
    * values via a broadcast semi-filtered aggregate, thresholded on
    * share. Unlike CMS/SpaceSaving the reported counts are exact and
    * the whole computation is a pure function of the data (bit-exact
    * oracle replay); unlike a full groupBy(value) the verify pass
    * aggregates only candidate rows — at 100 TB the heavy tail of
    * billions of near-unique values never reaches the shuffle.
    *
    * Returns (groupCols..., item, n, share) for items with
    * share ≥ minShare, where share = n / group row count.
    */
  def heavyHitters(df: DataFrame, groupCols: Seq[String], key: Column,
      value: Column, k: Int = 4096, minShare: Double = 0.01): DataFrame = {
    require(minShare > 0 && minShare <= 1,
      s"minShare must be in (0,1], got $minShare")
    val g = groupCols.map(col)
    val totals = df.groupBy(g: _*).agg(count(lit(1)).as("__tot"))
    val cands = sampleBottomK(df.select(g :+ key.as("__key") :+
        value.as("item"): _*), groupCols, col("__key"), k)
      .select(g :+ col("item"): _*).distinct()
    df.select(g :+ value.as("item"): _*)
      .join(broadcast(cands), groupCols :+ "item")
      .groupBy(g :+ col("item"): _*).agg(count(lit(1)).as("n"))
      .join(totals, groupCols)
      .withColumn("share", col("n").cast("double") / col("__tot").cast("double"))
      .filter(col("share") >= minShare)
      .select(g ++ Seq(col("item"), col("n"), col("share")): _*)
  }

  /** DuckDB mirror for `heavyHitters` — identical sample membership,
    * exact candidate counts, same share threshold.
    */
  def heavyHittersSql(src: String, groupCols: Seq[String], keySql: String,
      valueSql: String, k: Int, minShare: Double): String = {
    val g = groupCols.mkString(", ")
    val gq = groupCols.map(c => s"t.$c").mkString(", ")
    val h = graft.functions.OracleSql.tokenHash(s"CAST($keySql AS VARCHAR)")
    s"""keyed AS (
       |  SELECT $g, $valueSql AS item, CAST($keySql AS VARCHAR) AS ks, $h AS hk
       |  FROM $src WHERE $keySql IS NOT NULL
       |),
       |cands AS (
       |  SELECT DISTINCT $g, item FROM (
       |    SELECT *, row_number() OVER (PARTITION BY $g ORDER BY hk, ks) AS rn
       |    FROM keyed
       |  ) WHERE rn <= $k
       |),
       |totals AS (SELECT $g, count(*) AS tot FROM $src GROUP BY $g),
       |counted AS (
       |  SELECT ${groupCols.map(c => s"k.$c").mkString(", ")}, k.item,
       |         count(*) AS n
       |  FROM (SELECT $g, $valueSql AS item FROM $src) k JOIN cands c
       |    ON ${(groupCols.map(c => s"k.$c = c.$c") :+ "k.item = c.item").mkString(" AND ")}
       |  GROUP BY ${groupCols.map(c => s"k.$c").mkString(", ")}, k.item
       |)
       |SELECT $gq, t.item, t.n,
       |       CAST(t.n AS DOUBLE) / CAST(x.tot AS DOUBLE) AS share
       |FROM counted t JOIN totals x
       |  ON ${groupCols.map(c => s"t.$c = x.$c").mkString(" AND ")}
       |WHERE CAST(t.n AS DOUBLE) / CAST(x.tot AS DOUBLE) >= $minShare""".stripMargin
  }

  /** Hash-space size of [[TextHash.tokenHash]]: 60 bits. */
  private val HashSpace: Long = 1L << 60

  /** WEIGHTED sample without replacement, exact k per group — the
    * Efraimidis–Spirakis (IPL 2006) one-pass scheme: each row draws
    * u = (hash+1)/2^60 ∈ (0,1] from its key's md5 hash and ranks by
    * jump key `-ln(u)/w`; the k SMALLEST ranks are exactly a weighted
    * sample without replacement (inclusion odds ∝ weight). Every step
    * is one IEEE operation (cast, add, divide, libm `ln` — the
    * [[graft.functions.JavaLog]] contract, divide, negate — each
    * rounding identically on both engines), so
    * membership is a pure, DuckDB-replayable function of the data —
    * and therefore mergeable exactly like [[sampleBottomK]]:
    * merge(sample(A), sample(B)) == sample(A ∪ B).
    *
    * Rows with NULL keys, or NULL/non-positive weights, are excluded.
    * Trimming is the same salted two-phase window (no hot-group
    * reducer), ordered by (rank key, key string) — a total order on
    * distinct keys. Returns the sampled rows plus `__wk`/`__ks` (kept
    * so merges re-trim without recomputing).
    */
  def weightedSampleBottomK(df: DataFrame, groupCols: Seq[String],
      key: Column, weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val keyed = df.filter(key.isNotNull && weight.isNotNull &&
        weight.cast("double") > 0.0)
      .withColumn("__ks", key.cast("string"))
      .withColumn("__wk", -(graft.functions.JavaMath.jlog(
        (TextHash.tokenHash(col("__ks")).cast("double") + lit(1.0)) /
          lit(HashSpace.toDouble)) / weight.cast("double")))
    trimByRank(keyed, groupCols, k)
  }

  /** The weighted trim: salted two-phase bottom-k ordered by the A-ES
    * rank key (same superset argument as [[trim]]).
    */
  private def trimByRank(df: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    val g = groupCols.map(col)
    val w1 = Window.partitionBy(g :+ pmod(
        TextHash.tokenHash(col("__ks")), lit(Salts)): _*)
      .orderBy(col("__wk"), col("__ks"))
    val w2 = Window.partitionBy(g: _*).orderBy(col("__wk"), col("__ks"))
    df.withColumn("__rn", row_number().over(w1)).filter(col("__rn") <= k)
      .withColumn("__rn", row_number().over(w2)).filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Merge two weighted samples of the same k (dedup re-delivered rows,
    * re-trim on the stored rank key): merge == one-shot exactly, by the
    * same pure-membership argument as [[mergeSamples]].
    */
  def mergeWeightedSamples(a: DataFrame, b: DataFrame,
      groupCols: Seq[String], k: Int): DataFrame =
    trimByRank(a.unionByName(b).dropDuplicates(groupCols :+ "__ks"),
      groupCols, k)

  /** Streaming maintenance of a weighted sample in a snapshot lake —
    * the [[sampleStream]] pattern with the weighted trim: recompute
    * old-state ∪ batch, swap in with one atomic replace; replays
    * converge with zero bookkeeping because membership is pure.
    */
  def weightedSampleStream(root: String, groupCols: Seq[String],
      key: Column, weight: Column, k: Int): (DataFrame, Long) => Unit = {
    (df, _) =>
      import graft.sinks.SnapshotLake
      val spark = df.sparkSession
      val batch = weightedSampleBottomK(df, groupCols, key, weight, k)
      if (SnapshotLake.latestVersion(spark, root).isEmpty)
        SnapshotLake.append(spark, root, batch)
      else
        SnapshotLake.replace(spark, root, mergeWeightedSamples(
          SnapshotLake.read(spark, root), batch, groupCols, k))
  }

  /** DuckDB mirror of [[weightedSampleBottomK]] as a CTE fragment whose
    * final SELECT projects `outCols` of the sampled rows — the
    * equivalent one-window trim (identical membership).
    */
  def weightedSampleSql(src: String, groupCols: Seq[String],
      keySql: String, weightSql: String, k: Int,
      outCols: Seq[String]): String = {
    val gl = (groupCols :+ "").mkString(", ").stripSuffix(", ")
    val h = graft.functions.OracleSql.tokenHash(s"CAST($keySql AS VARCHAR)")
    val part = if (groupCols.isEmpty) "" else s"PARTITION BY $gl "
    s"""ws_keyed AS (
       |  SELECT *,
       |         CAST($keySql AS VARCHAR) AS ks,
       |         -(ln((CAST($h AS DOUBLE) + 1.0) / ${HashSpace.toDouble})
       |           / CAST($weightSql AS DOUBLE)) AS wk
       |  FROM $src
       |  WHERE $keySql IS NOT NULL AND $weightSql IS NOT NULL
       |    AND CAST($weightSql AS DOUBLE) > 0.0
       |),
       |ws_trimmed AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (${part}ORDER BY wk, ks) AS rn
       |    FROM ws_keyed
       |  ) WHERE rn <= $k
       |)
       |SELECT ${outCols.mkString(", ")} FROM ws_trimmed""".stripMargin
  }

  /** KMV / theta sketch of a VALUE SET: the k smallest distinct 60-bit
    * hashes. Distinct-count estimate = |{h < θ}| · M/θ with θ = the k-th
    * smallest hash (M when fewer than k distinct values exist — then the
    * sketch is the whole set and every estimate is exact). `orderBy.limit`
    * plans as TakeOrdered: a bounded per-partition heap + driver merge,
    * never a global sort.
    */
  def kmvSketch(df: DataFrame, value: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.filter(value.isNotNull)
      .select(TextHash.tokenHash(value.cast("string")).as("h"))
      .distinct().orderBy("h").limit(k)
  }

  /** Distinct-set overlap between two datasets WITHOUT a join of the
    * datasets themselves — the snapshot-overlap / retention question at
    * 100 TB: each side is reduced to its k-hash KMV sketch (one
    * map-side-combined distinct + a bounded TakeOrdered each), and the
    * theta-sketch set algebra runs on ≤2k driver-side longs. With
    * θ = min(θ_a, θ_b) and X' = {h ∈ sketch_X : h < θ}:
    * |A∪B| ≈ |A'∪B'|·M/θ, |A∩B| ≈ |A'∩B'|·M/θ, J ≈ |A'∩B'|/|A'∪B'|
    * (rel. std. error ~1/√k). Everything is a pure function of the data
    * (md5 hashes, exact counts, one double multiply in a fixed shape),
    * so the DuckDB oracle replays the row bit-for-bit.
    *
    * Returns ONE row: (n_a, n_b, n_union, n_intersect, jaccard).
    */
  def thetaOverlap(a: DataFrame, b: DataFrame, valueA: Column,
      valueB: Column, k: Int = 4096): DataFrame = {
    val spark = a.sparkSession
    // bounded collects: each sketch is ≤ k longs by construction
    val ha = kmvSketch(a, valueA, k).collect().map(_.getLong(0))
    val hb = kmvSketch(b, valueB, k).collect().map(_.getLong(0))
    def thetaOf(s: Array[Long]) = if (s.length < k) HashSpace else s.max
    val theta = math.min(thetaOf(ha), thetaOf(hb))
    val aP = ha.filter(_ < theta)
    val bP = hb.filter(_ < theta)
    val bSet = bP.toSet
    val nInter = aP.count(bSet.contains)
    val nUnion = (aP.toSet ++ bSet).size
    val scale = HashSpace.toDouble / theta.toDouble
    val jac: Any =
      if (nUnion == 0) null else nInter.toDouble / nUnion.toDouble
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(
        aP.length.toDouble * scale, bP.length.toDouble * scale,
        nUnion.toDouble * scale, nInter.toDouble * scale, jac)), 1),
      StructType(Seq(
        StructField("n_a", DoubleType, nullable = false),
        StructField("n_b", DoubleType, nullable = false),
        StructField("n_union", DoubleType, nullable = false),
        StructField("n_intersect", DoubleType, nullable = false),
        StructField("jaccard", DoubleType, nullable = true))))
  }

  /** Per-group KMV sketch: the k smallest distinct hashes PER GROUP,
    * trimmed with the same salted two-phase window as [[sampleBottomK]]
    * (no hot-group single reducer; phase 1 keeps a superset of each
    * group's bottom-k, so the result equals the one-window form).
    */
  def kmvSketchByGroup(df: DataFrame, groupCols: Seq[String],
      value: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val g = groupCols.map(col)
    val hashed = df.filter(value.isNotNull)
      .select(g :+ TextHash.tokenHash(value.cast("string")).as("h"): _*)
      .distinct()
    val w1 = Window.partitionBy(g :+ pmod(col("h"), lit(Salts)): _*)
      .orderBy("h")
    val w2 = Window.partitionBy(g: _*).orderBy("h")
    hashed.withColumn("__rn", row_number().over(w1)).filter(col("__rn") <= k)
      .withColumn("__rn", row_number().over(w2)).filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** [[thetaOverlap]] PER GROUP, fully distributed — per-source /
    * per-tenant distinct-key overlap between two snapshots with nothing
    * on the driver: both sides sketch per group (bounded ≤k hashes each),
    * θ = min of the per-group thetas (M for a side with <k distinct
    * values, including groups the side lacks entirely), and the trimmed
    * union/intersection counts aggregate per group. Groups present in
    * EITHER side report; a side with no rows reports 0 with the other
    * side's counts exact-or-estimated as usual. Same estimator row per
    * group as [[thetaOverlap]]: (groupCols..., n_a, n_b, n_union,
    * n_intersect, jaccard).
    */
  def thetaOverlapByGroup(a: DataFrame, b: DataFrame,
      groupCols: Seq[String], valueA: Column, valueB: Column,
      k: Int = 4096): DataFrame = {
    val g = groupCols.map(col)
    // One union-tagged (group, hash) GRAIN instead of the former
    // join-of-aggregates DAG: the old shape consumed each side's sketch
    // pipeline (scan → distinct → two trim windows) in the theta join,
    // both trims, and four count aggregates — Catalyst re-evaluated the
    // subtree per consumer (measured: 40 parquet scans / 152 Exchanges in
    // ts2's physical plan). Each side is distinct in (group, h) by
    // construction, so presence flags at the grain reproduce every count
    // exactly; the grain is bounded (≤ 2k rows per group) and checkpointed
    // once, so the sketch pipelines run exactly once each.
    val ska = kmvSketchByGroup(a, groupCols, valueA, k)
      .select(g ++ Seq(col("h"), lit(1L).as("__a"), lit(0L).as("__b")): _*)
    val skb = kmvSketchByGroup(b, groupCols, valueB, k)
      .select(g ++ Seq(col("h"), lit(0L).as("__a"), lit(1L).as("__b")): _*)
    val grain = ska.unionByName(skb)
      .groupBy(g :+ col("h"): _*)
      .agg(max(col("__a")).as("__a"), max(col("__b")).as("__b"))
      .localCheckpoint()
    // per-side theta from the grain: side count < k ⇒ the sketch holds the
    // side's whole distinct set ⇒ θ_side = M; else the side's max sketch
    // hash — identical to the former per-side count/max aggregates
    val thetas = grain.groupBy(g: _*).agg(
      least(
        when(sum(col("__a")) < k, lit(HashSpace))
          .otherwise(max(when(col("__a") === 1L, col("h")))),
        when(sum(col("__b")) < k, lit(HashSpace))
          .otherwise(max(when(col("__b") === 1L, col("h")))))
        .as("__t"))
    // trim at θ and fold all four counts in ONE aggregate; __t is constant
    // per group so first() is deterministic. Every group present in either
    // side keeps ≥ 1 trimmed row (θ = M keeps all; θ = a side's k-th hash
    // keeps that side's k-1 smaller ones), so no group drops out — the
    // same totality the former full-outer chain provided.
    val filled = grain.join(broadcast(thetas), groupCols)
      .filter(col("h") < col("__t"))
      .groupBy(g: _*).agg(
        sum(col("__a")).as("__ca"), sum(col("__b")).as("__cb"),
        count(lit(1)).as("__cu"),
        sum(col("__a") * col("__b")).as("__ci"),
        first(col("__t")).as("__t"))
    val scale = lit(HashSpace.toDouble) / col("__t").cast("double")
    filled.select(g ++ Seq(
      (col("__ca").cast("double") * scale).as("n_a"),
      (col("__cb").cast("double") * scale).as("n_b"),
      (col("__cu").cast("double") * scale).as("n_union"),
      (col("__ci").cast("double") * scale).as("n_intersect"),
      when(col("__cu") === 0, lit(null).cast("double"))
        .otherwise(col("__ci").cast("double") / col("__cu").cast("double"))
        .as("jaccard")): _*)
  }

  /** DuckDB mirror of [[thetaOverlapByGroup]] as a CTE fragment — the
    * one-window per-group trim (identical membership to the salted
    * two-phase form) + the same full-outer theta/count algebra.
    */
  def thetaOverlapByGroupSql(aSrc: String, bSrc: String,
      groupCols: Seq[String], valueASql: String, valueBSql: String,
      k: Int = 4096): String = {
    val gl = groupCols.mkString(", ")
    def on(l: String, r: String) =
      groupCols.map(c => s"$l.$c = $r.$c").mkString(" AND ")
    def gq(t: String) = groupCols.map(c => s"$t.$c").mkString(", ")
    def hash(v: String) =
      graft.functions.OracleSql.tokenHash(s"CAST($v AS VARCHAR)")
    val m = HashSpace
    def sketch(src: String, v: String) =
      s"""SELECT $gl, h FROM (
         |  SELECT $gl, h, row_number() OVER (PARTITION BY $gl ORDER BY h) AS rn
         |  FROM (SELECT DISTINCT $gl, ${hash(v)} AS h FROM $src
         |        WHERE $v IS NOT NULL)
         |) WHERE rn <= $k""".stripMargin
    s"""tg_ska AS (${sketch(aSrc, valueASql)}),
       |tg_skb AS (${sketch(bSrc, valueBSql)}),
       |tg_ta AS (SELECT $gl, CASE WHEN count(*) < $k THEN $m ELSE max(h) END AS ta
       |          FROM tg_ska GROUP BY $gl),
       |tg_tb AS (SELECT $gl, CASE WHEN count(*) < $k THEN $m ELSE max(h) END AS tb
       |          FROM tg_skb GROUP BY $gl),
       |tg_t AS (
       |  SELECT ${groupCols.map(c => s"COALESCE(tg_ta.$c, tg_tb.$c) AS $c").mkString(", ")},
       |         least(COALESCE(ta, $m), COALESCE(tb, $m)) AS t
       |  FROM tg_ta FULL OUTER JOIN tg_tb ON ${on("tg_ta", "tg_tb")}
       |),
       |tg_ap AS (SELECT ${gq("s")}, s.h FROM tg_ska s JOIN tg_t
       |          ON ${on("s", "tg_t")} WHERE s.h < tg_t.t),
       |tg_bp AS (SELECT ${gq("s")}, s.h FROM tg_skb s JOIN tg_t
       |          ON ${on("s", "tg_t")} WHERE s.h < tg_t.t),
       |tg_ca AS (SELECT $gl, count(*) AS ca FROM tg_ap GROUP BY $gl),
       |tg_cb AS (SELECT $gl, count(*) AS cb FROM tg_bp GROUP BY $gl),
       |tg_cu AS (SELECT $gl, count(*) AS cu FROM
       |  (SELECT $gl, h FROM tg_ap UNION SELECT $gl, h FROM tg_bp)
       |  GROUP BY $gl),
       |tg_ci AS (SELECT ${gq("x")}, count(*) AS ci FROM tg_ap x JOIN tg_bp y
       |          ON ${on("x", "y")} AND x.h = y.h GROUP BY ${gq("x")})
       |SELECT ${gq("tg_t")},
       |       CAST(COALESCE(ca, 0) AS DOUBLE) * (CAST($m AS DOUBLE) / CAST(t AS DOUBLE)) AS n_a,
       |       CAST(COALESCE(cb, 0) AS DOUBLE) * (CAST($m AS DOUBLE) / CAST(t AS DOUBLE)) AS n_b,
       |       CAST(COALESCE(cu, 0) AS DOUBLE) * (CAST($m AS DOUBLE) / CAST(t AS DOUBLE)) AS n_union,
       |       CAST(COALESCE(ci, 0) AS DOUBLE) * (CAST($m AS DOUBLE) / CAST(t AS DOUBLE)) AS n_intersect,
       |       CASE WHEN COALESCE(cu, 0) = 0 THEN CAST(NULL AS DOUBLE)
       |            ELSE CAST(COALESCE(ci, 0) AS DOUBLE) / CAST(cu AS DOUBLE)
       |       END AS jaccard
       |FROM tg_t
       |LEFT JOIN tg_ca ON ${on("tg_t", "tg_ca")}
       |LEFT JOIN tg_cb ON ${on("tg_t", "tg_cb")}
       |LEFT JOIN tg_cu ON ${on("tg_t", "tg_cu")}
       |LEFT JOIN tg_ci ON ${on("tg_t", "tg_ci")}""".stripMargin
  }

  /** DuckDB mirror of [[thetaOverlap]] as a CTE fragment: identical
    * sketches, trim, and double arithmetic shape.
    */
  def thetaOverlapSql(aSrc: String, bSrc: String, valueASql: String,
      valueBSql: String, k: Int = 4096): String = {
    def hash(v: String) =
      graft.functions.OracleSql.tokenHash(s"CAST($v AS VARCHAR)")
    val m = HashSpace
    s"""theta_ska AS (
       |  SELECT DISTINCT ${hash(valueASql)} AS h FROM $aSrc
       |  WHERE $valueASql IS NOT NULL ORDER BY h LIMIT $k
       |),
       |theta_skb AS (
       |  SELECT DISTINCT ${hash(valueBSql)} AS h FROM $bSrc
       |  WHERE $valueBSql IS NOT NULL ORDER BY h LIMIT $k
       |),
       |theta_t AS (
       |  SELECT least(
       |    (SELECT CASE WHEN count(*) < $k THEN $m ELSE max(h) END FROM theta_ska),
       |    (SELECT CASE WHEN count(*) < $k THEN $m ELSE max(h) END FROM theta_skb)) AS t
       |),
       |theta_ap AS (SELECT h FROM theta_ska, theta_t WHERE h < t),
       |theta_bp AS (SELECT h FROM theta_skb, theta_t WHERE h < t),
       |theta_u AS (SELECT count(*) AS c FROM
       |  (SELECT h FROM theta_ap UNION SELECT h FROM theta_bp)),
       |theta_i AS (SELECT count(*) AS c FROM theta_ap
       |  WHERE h IN (SELECT h FROM theta_bp)),
       |theta_ca AS (SELECT count(*) AS c FROM theta_ap),
       |theta_cb AS (SELECT count(*) AS c FROM theta_bp)
       |SELECT CAST(theta_ca.c AS DOUBLE) * (CAST($m AS DOUBLE) / CAST(theta_t.t AS DOUBLE)) AS n_a,
       |       CAST(theta_cb.c AS DOUBLE) * (CAST($m AS DOUBLE) / CAST(theta_t.t AS DOUBLE)) AS n_b,
       |       CAST(theta_u.c AS DOUBLE) * (CAST($m AS DOUBLE) / CAST(theta_t.t AS DOUBLE)) AS n_union,
       |       CAST(theta_i.c AS DOUBLE) * (CAST($m AS DOUBLE) / CAST(theta_t.t AS DOUBLE)) AS n_intersect,
       |       CASE WHEN theta_u.c = 0 THEN CAST(NULL AS DOUBLE)
       |            ELSE CAST(theta_i.c AS DOUBLE) / CAST(theta_u.c AS DOUBLE)
       |       END AS jaccard
       |FROM theta_ca, theta_cb, theta_u, theta_i, theta_t""".stripMargin
  }

  /** DuckDB mirror for `approxQuantiles(src, groupCols, keySql, valueSql,
    * k, qs)` — the equivalent ONE-window trim (identical membership) +
    * quantile_cont.
    */
  def approxQuantilesSql(src: String, groupCols: Seq[String],
      keySql: String, valueSql: String, k: Int, qs: Seq[Double]): String = {
    val g = groupCols.mkString(", ")
    val h = graft.functions.OracleSql.tokenHash(s"CAST($keySql AS VARCHAR)")
    val qcols = qs.zipWithIndex.map { case (q, i) =>
      s"quantile_cont($valueSql, $q) AS q_$i"
    }.mkString(",\n       ")
    s"""keyed AS (
       |  SELECT *, CAST($keySql AS VARCHAR) AS ks, $h AS hk
       |  FROM $src WHERE $keySql IS NOT NULL
       |),
       |trimmed AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY $g ORDER BY hk, ks) AS rn
       |    FROM keyed
       |  ) WHERE rn <= $k
       |)
       |SELECT $g,
       |       $qcols
       |FROM trimmed GROUP BY $g""".stripMargin
  }
}
