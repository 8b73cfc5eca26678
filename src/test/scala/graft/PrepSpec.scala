package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Normalize, Split}

/** Reference invariants from tests/units/test_processing.py:60-73 and
  * test_data_splitter.py (SURVEY §5): normalize round-trips, zero-mean /
  * [0,1] bounds, split conservation + temporal ordering; plus as-of join
  * semantics vs a hand-computed expectation.
  */
class PrepSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 500)
    .map(i => (i.toLong, 50.0 + (i % 23) * 1.7, 10.0 + (i % 11)))
    .toDF("id", "open", "volume")

  test("z-score normalize has ~zero mean, unit variance, and round-trips") {
    val cols = Seq("open", "volume")
    val fitted = Normalize.zscoreFit(df, cols)
    val z = Normalize.zscoreTransform(fitted, cols)
    val stats = z.agg(avg("open"), stddev_samp("open")).as[(Double, Double)].head()
    assert(math.abs(stats._1) < 1e-10 && math.abs(stats._2 - 1.0) < 1e-10)
    val rt = Normalize.finish(Normalize.zscoreInverse(z, cols))
    val maxErr = rt.join(df.withColumnRenamed("open", "o0"), "id")
      .agg(max(abs($"open" - $"o0"))).as[Double].head()
    assert(maxErr < 1e-10)
  }

  test("min-max normalize lands in [0,1] and round-trips") {
    val cols = Seq("open")
    val mm = Normalize.minmaxTransform(Normalize.minmaxFit(df, cols), cols)
    val (mn, mx) = mm.agg(min("open"), max("open")).as[(Double, Double)].head()
    assert(mn == 0.0 && mx == 1.0)
    val rt = Normalize.finish(Normalize.minmaxInverse(mm, cols))
    val maxErr = rt.join(df.withColumnRenamed("open", "o0"), "id")
      .agg(max(abs($"open" - $"o0"))).as[Double].head()
    assert(maxErr < 1e-10)
  }

  test("log normalize round-trips via expm1") {
    val lg = Normalize.logTransform(df, Seq("volume"))
    val rt = Normalize.logInverse(lg, Seq("volume"))
    val maxErr = rt.join(df.withColumnRenamed("volume", "v0"), "id")
      .agg(max(abs($"volume" - $"v0"))).as[Double].head()
    assert(maxErr < 1e-10)
  }

  test("chronological split conserves rows and respects temporal order") {
    val ts = df.withColumn("ts",
      timestamp_seconds(lit(1704067200L) + $"id" * 60))
    val s = Split.chronological(ts, Seq($"ts"), Seq(0.8), Seq("train", "test"))
    val counts = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts("train") + counts("test") == 500)
    assert(counts("train") == 400) // floor(500*0.8)
    val maxTrain = s.filter($"split" === "train").agg(max("ts")).head().getTimestamp(0)
    val minTest = s.filter($"split" === "test").agg(min("ts")).head().getTimestamp(0)
    assert(maxTrain.before(minTest))
  }

  test("token packing: prefix bins, conservation, offsets, overflow bound") {
    // two groups with known token counts; budget 100
    val docs = Seq(
      ("a", 1L, 60), ("a", 2L, 30), ("a", 3L, 30), ("a", 4L, 95), ("a", 5L, 10),
      ("b", 1L, 250), ("b", 2L, 1)
    ).toDF("src", "id", "n_tok")
    val packed = Split.packByTokenBudget(docs, Seq($"src"), Seq($"id"),
        $"n_tok", budget = 100L)
      .select($"src", $"id", $"bin_id", $"bin_offset")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // group a prefixes: 0,60,90,120,215 → bins 0,0,0,1,2; offsets 0,60,90,20,15
    // group b prefixes: 0,250 → bins 0,2 (oversized doc owns bins 0-1; the
    // straddler's successor lands where the prefix says, not "next bin")
    assert(packed.toSeq == Seq(
      ("a", 1L, 0L, 0L), ("a", 2L, 0L, 60L), ("a", 3L, 0L, 90L),
      ("a", 4L, 1L, 20L), ("a", 5L, 2L, 15L),
      ("b", 1L, 0L, 0L), ("b", 2L, 2L, 50L)))
    // every doc is in exactly one bin (assignment is a projection, no dedup)
    assert(packed.length == 7)
    // bin_id is non-decreasing in pack order within each group
    Seq("a", "b").foreach { g =>
      val bins = packed.filter(_._1 == g).map(_._3)
      assert(bins.zip(bins.tail).forall { case (x, y) => x <= y })
    }
  }

  test("chunked token packing == plain packing bit-for-bit, 90%-hot source included") {
    // one hot source owns 90% of the corpus — the shape that serializes
    // the plain per-source window; chunking must not change a single label
    val docs = (1L to 5000L).map { i =>
      val src = if (i % 10 == 0) s"cold${i % 3}" else "hot"
      (src, i, (i * 37 % 190 + 10).toInt)
    }.toDF("src", "id", "n_tok")
    val plain = Split.packByTokenBudget(docs, Seq($"src"), Seq($"id"),
        $"n_tok", budget = 256L)
      .select($"src", $"id", $"bin_id", $"bin_offset")
      .collect().map(_.toString).sorted
    for (chunkRows <- Seq(64L, 100L, 4096L, 1000000L)) { // incl. one-chunk edge
      val chunked = Split.packByTokenBudgetChunked(docs, Seq($"src"), Seq($"id"),
          expr(s"id DIV $chunkRows"), $"n_tok", budget = 256L)
        .select($"src", $"id", $"bin_id", $"bin_offset")
        .collect().map(_.toString).sorted
      assert(chunked.sameElements(plain), s"chunkRows=$chunkRows")
    }
    // and the chunked plan actually distributes: the big-side exchange
    // hashes on (src, __chunk), not src alone — the hot source's rows
    // spread across chunk partitions (AQE may coalesce tiny test
    // shuffles, so assert the partitioning expression, not task counts)
    val plan = Split.packByTokenBudgetChunked(docs, Seq($"src"), Seq($"id"),
        expr("id DIV 64"), $"n_tok", budget = 256L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(src") && plan.contains("__chunk"),
      s"expected an exchange keyed on (src, __chunk):\n$plan")

    // NULL partition values must keep their labels: a window treats NULL
    // as its own group, and the chunked join must not drop them (struct
    // keys are null-safe; a using-columns join would lose every row)
    val withNulls = docs.withColumn("src",
      when($"id" % 5 === 0, lit(null)).otherwise($"src"))
    val plainN = Split.packByTokenBudget(withNulls, Seq($"src"), Seq($"id"),
        $"n_tok", budget = 256L)
      .select($"src", $"id", $"bin_id", $"bin_offset")
      .collect().map(_.toString).sorted
    val chunkedN = Split.packByTokenBudgetChunked(withNulls, Seq($"src"), Seq($"id"),
        expr("id DIV 64"), $"n_tok", budget = 256L)
      .select($"src", $"id", $"bin_id", $"bin_offset")
      .collect().map(_.toString).sorted
    assert(chunkedN.length == plainN.length && chunkedN.sameElements(plainN))
  }

  test("stratified hash sample: deterministic, rate-faithful, composes with hashSplit") {
    val docs = (1L to 20000L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    val rates = Map("src0" -> 0.5, "src1" -> 0.1, "src2" -> 1.0)
    val s1 = Split.stratifiedHashSample(docs, $"id", $"src", rates, defaultRate = 0.0)
    // deterministic: two runs agree exactly
    assert(s1.collect().toSet == Split.stratifiedHashSample(
      docs, $"id", $"src", rates, defaultRate = 0.0).collect().toSet)
    val counts = s1.groupBy("src").count().as[(String, Long)].collect().toMap
    // 5000 rows per stratum; multiplicative-hash uniformity → within ~3%
    assert(math.abs(counts("src0") - 2500.0) < 150)
    assert(math.abs(counts("src1") - 500.0) < 150)
    assert(counts("src2") == 5000) // rate 1.0 keeps every row
    assert(!counts.contains("src3")) // defaultRate 0.0 drops unlisted strata
    // composition: sample-then-split keeps the 0.8 train fraction in EVERY
    // stratum — the sampler's multiplier is independent of hashSplit's, so
    // even the 0.1-rate stratum's survivors split ~80/20 (with a shared
    // multiplier they would be a prefix of the split range: 100% train)
    val split = Split.hashSplit(s1, $"id", 0.8)
    Seq("src0", "src1", "src2").foreach { g =>
      val in = split.filter($"src" === g)
      val frac = in.filter($"split" === "train").count().toDouble / in.count()
      assert(math.abs(frac - 0.8) < 0.05, s"$g train fraction $frac")
    }
  }

  test("shuffled shards: deterministic, conserving, dense positions, balanced") {
    val docs = (1L to 8000L).toDF("id")
    val s1 = Split.shuffledShards(docs, $"id", nShards = 8)
      .select($"id", $"shard_id", $"pos")
    val rows = s1.as[(Long, Int, Int)].collect()
    assert(rows.length == 8000) // labeling is a projection: no loss, no dup
    assert(rows.toSet == Split.shuffledShards(docs, $"id", 8)
      .select($"id", $"shard_id", $"pos").as[(Long, Int, Int)].collect().toSet)
    val byShard = rows.groupBy(_._2)
    assert(byShard.keySet == (0 until 8).toSet)
    byShard.foreach { case (sh, rs) =>
      // positions are dense 1..n within each shard
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length))
      // uniform hash → balanced shards (1000 ± 10%)
      assert(math.abs(rs.length - 1000) < 100, s"shard $sh size ${rs.length}")
    }
    // it actually shuffles: within-shard order is not key order
    val firstShard = byShard(0).sortBy(_._3).map(_._1)
    assert(firstShard.toSeq != firstShard.sorted.toSeq)
  }

  test("mixture weights: tokens^0.5 flattening, exact normalization, budget math") {
    // big source: 1M tokens; small source: 10k tokens — a 100:1 corpus
    val docs = Seq(("big", 1000000L), ("small", 10000L), ("small", 0L))
      .toDF("src", "n_tok")
    val w = Split.mixtureWeights(docs, $"src", $"n_tok", budgetTokens = 1000000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    assert(w("big")._2 == 1000000L && w("small")._2 == 10000L)
    // sqrt flattening: the 100:1 token ratio becomes a 10:1 weight ratio
    assert(w("big")._3 == 1000000000L && w("small")._3 == 100000000L)
    assert(math.abs(w("big")._4 / w("small")._4 - 10.0) < 1e-12)
    // weights normalize exactly (integer total ⇒ the sum of the two
    // divisions reconstructs 1.0 up to one ulp)
    assert(math.abs(w("big")._4 + w("small")._4 - 1.0) < 1e-15)
    // expected tokens split the budget 10:1; the small source repeats
    // (epochs > 1) while the big one is subsampled (epochs < 1)
    assert(math.abs(w("big")._5 - 909090.909) < 1.0)
    assert(w("small")._6 > 1.0 && w("big")._6 < 1.0)
    // determinism under repartitioning: same rows at any parallelism
    val w2 = Split.mixtureWeights(docs.repartition(7), $"src", $"n_tok", 1000000L)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(w2("big") == w("big")._4 && w2("small") == w("small")._4)
  }

  test("mixture sampling keeps repeated sources whole and subsamples the giant") {
    // big: 8k docs / 80k tokens; small: 200 docs / 2k tokens; budget 30k.
    // sqrt weights → big epochs ≈ 0.324 (subsampled), small ≈ 2.05 (capped: keep all)
    val docs = ((1L to 8000L).map(i => (i, "big", 10)) ++
      (10001L to 10200L).map(i => (i, "small", 10)))
      .toDF("doc_id", "src", "n_tok")
    val kept = Split.sampleToMixture(docs, $"doc_id", $"src", $"n_tok", 30000L)
      .select($"doc_id", $"src").as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("small") == 200) // epochs > 1 → rate capped at 1, nothing dropped
    val bigRate = bySrc("big") / 8000.0
    assert(bigRate > 0.29 && bigRate < 0.36, s"big keep rate $bigRate")
    // deterministic: same kept SET at any parallelism
    val again = Split.sampleToMixture(docs.repartition(13), $"doc_id", $"src",
      $"n_tok", 30000L).select($"doc_id", $"src").as[(Long, String)].collect()
    assert(kept.toSet == again.toSet)
  }

  test("sliding windows have exact shapes and stride") {
    val ts = df.withColumn("symbol", lit("A"))
    val wdf = Split.slidingWindows(ts, Seq($"symbol"), Seq($"id"),
      $"open", window = 8, target = 2, stride = 4)
    val rows = wdf.select($"x", $"y").as[(Seq[Double], Seq[Double])].collect()
    // starts at rn=1,5,9,... while rn+9 <= 500 → (500-10)/4+1 = 123 windows
    assert(rows.length == 123)
    assert(rows.forall { case (x, y) => x.size == 8 && y.size == 2 })
    // x of window k starts at row 4k+1
    val first = wdf.orderBy("window_start_rn").select($"x").as[Seq[Double]].head()
    assert(first == (1 to 8).map(i => 50.0 + (i % 23) * 1.7))
  }

  test("multi-feature sliding windows: shape (n,window,features), stride, null slots") {
    val ts = df.withColumn("symbol", lit("A"))
      // null out one open value to prove slots are preserved (numpy keeps NaN)
      .withColumn("open", when($"id" === 3L, lit(null)).otherwise($"open"))
    val wdf = Split.slidingWindowsMulti(ts, Seq($"symbol"), Seq($"id"),
      Seq("open", "volume"), window = 8, target = 2, stride = 4)
    val rows = wdf.select($"x_open", $"y_open", $"x_volume", $"y_volume")
      .as[(Seq[Option[Double]], Seq[Option[Double]], Seq[Double], Seq[Double])]
      .collect()
    // same window count as the single-feature variant: (500-10)/4+1 = 123
    assert(rows.length == 123)
    assert(rows.forall { case (xo, yo, xv, yv) =>
      xo.size == 8 && yo.size == 2 && xv.size == 8 && yv.size == 2 })
    val first = wdf.orderBy("window_start_rn")
      .select($"x_open", $"x_volume")
      .as[(Seq[Option[Double]], Seq[Double])].head()
    // id=3 (index 2) is null but KEEPS its slot; volume is untouched
    assert(first._1(2).isEmpty)
    assert(first._1.zipWithIndex.forall { case (v, i) =>
      i == 2 || v.contains(50.0 + ((i + 1) % 23) * 1.7) })
    assert(first._2 == (1 to 8).map(i => 10.0 + (i % 11)))
  }

  test("as-of join picks the latest right row at-or-before each left ts") {
    def t(s: String) = Timestamp.valueOf(s)
    val probes = Seq(
      ("A", t("2024-01-01 00:05:00"), 1L),
      ("A", t("2024-01-01 00:10:00"), 2L),
      ("A", t("2024-01-01 00:00:30"), 3L),
      ("B", t("2024-01-01 00:01:00"), 4L)
    ).toDF("symbol", "ts", "probe_id")
    val quotes = Seq(
      ("A", t("2024-01-01 00:00:00"), 100.0),
      ("A", t("2024-01-01 00:05:00"), 105.0), // equal ts → must match
      ("A", t("2024-01-01 00:09:00"), 109.0)
    ).toDF("symbol", "ts", "close")
    val out = AsOfJoin.asof(probes, quotes, Seq("symbol"), "ts", Seq("close"))
      .select($"probe_id", $"right_close").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) == Some(105.0))
    assert(out(2L) == Some(109.0))
    assert(out(3L) == Some(100.0))
    assert(out(4L) == None) // no B quotes
  }

  test("forward and nearest as-of directions match pandas merge_asof semantics") {
    def t(s: String) = Timestamp.valueOf(s)
    val probes = Seq(
      ("A", t("2024-01-01 00:04:00"), 1L), // back 0:00(240s) fwd 0:05(60s) → fwd
      ("A", t("2024-01-01 00:01:00"), 2L), // back 0:00(60s) fwd 0:05(240s) → back
      ("A", t("2024-01-01 00:12:00"), 3L), // no forward quote → back 0:09
      ("B", t("2024-01-01 00:01:00"), 4L)  // no B quotes at all
    ).toDF("symbol", "ts", "probe_id")
    val quotes = Seq(
      ("A", t("2024-01-01 00:00:00"), 100.0),
      ("A", t("2024-01-01 00:05:00"), 105.0),
      ("A", t("2024-01-01 00:09:00"), 109.0)
    ).toDF("symbol", "ts", "close")
    def res(df: org.apache.spark.sql.DataFrame) = df
      .select($"probe_id", $"right_close").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val fwd = res(AsOfJoin.asofForward(probes, quotes, Seq("symbol"), "ts", Seq("close")))
    assert(fwd(1L) == Some(105.0))
    assert(fwd(2L) == Some(105.0))
    assert(fwd(3L) == None) // nothing at-or-after 00:12
    assert(fwd(4L) == None)
    val near = res(AsOfJoin.asofNearest(probes, quotes, Seq("symbol"), "ts", Seq("close")))
    assert(near(1L) == Some(105.0)) // forward is closer
    assert(near(2L) == Some(100.0)) // backward is closer
    assert(near(3L) == Some(109.0)) // only backward exists
    assert(near(4L) == None)
    // equidistant → ties to backward
    val mid = Seq(("A", t("2024-01-01 00:02:30"), 9L)).toDF("symbol", "ts", "probe_id")
    val nm = res(AsOfJoin.asofNearest(mid, quotes, Seq("symbol"), "ts", Seq("close")))
    assert(nm(9L) == Some(100.0))
  }

  test("as-of join tolerance nulls out stale matches") {
    def t(s: String) = Timestamp.valueOf(s)
    val probes = Seq(("A", t("2024-01-01 01:00:00"), 1L)).toDF("symbol", "ts", "probe_id")
    val quotes = Seq(("A", t("2024-01-01 00:00:00"), 100.0)).toDF("symbol", "ts", "close")
    val within = AsOfJoin.asof(probes, quotes, Seq("symbol"), "ts", Seq("close"),
      toleranceUs = Some(2L * 3600 * 1000000))
    val beyond = AsOfJoin.asof(probes, quotes, Seq("symbol"), "ts", Seq("close"),
      toleranceUs = Some(1800L * 1000000))
    assert(!within.select("right_close").head().isNullAt(0))
    assert(beyond.select("right_close").head().isNullAt(0))
  }
}
