package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity operators over embedding columns (`array<float>`):
  * cosine similarity, brute-force top-k, random-hyperplane LSH bucketing,
  * blocked near-duplicate pairs.
  *
  * Numeric discipline: every reduction is a LEFT-TO-RIGHT fold over the
  * array index order (`aggregate` in Spark, `list_reduce` in DuckDB), with
  * floats widened to double element-wise — both engines then produce
  * bit-identical doubles, so cosine values hash-compare exactly.
  *
  * Scale design (100 TB): brute-force top-k broadcasts the (small) query
  * set and makes ONE pass over the corpus — no corpus self-join. The LSH
  * variant buckets both sides by hyperplane sign bits and equi-joins on the
  * bucket id, turning all-pairs into per-bucket work; the blocked pair scan
  * bounds the quadratic term by the blocking key. All expressions are
  * codegen'd (no UDFs).
  */
object VectorOps {

  /** Bit-exact dot product: one compiled loop forming each product once
    * and adding left-to-right — the identical op sequence as the legacy
    * products-array-then-fold, which survives as [[dotWitness]]
    * (VectorSpec asserts bit-equality; the HOF form is two interpreted
    * CodegenFallback lambdas and was the pair-stage hot spot).
    */
  def dot(a: Column, b: Column): Column = graft.functions.Dot.dot(a, b)

  /** The legacy HOF formulation, kept as the bit-equality witness. */
  private[graft] def dotWitness(a: Column, b: Column): Column =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"), _ * _),
      lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm — dot(a, a): each v·v formed once and added in index
    * order, the identical op sequence as the legacy fused fold (kept as
    * [[norm2Witness]]; bit-equality in VectorSpec).
    */
  def norm2(a: Column): Column = graft.functions.Dot.dot(a, a)

  private[graft] def norm2Witness(a: Column): Column =
    aggregate(a.cast("array<double>"), lit(0.0), (acc, v) => acc + v * v)

  /** Cosine similarity — dot / (sqrt(n2a) * sqrt(n2b)). try_divide: an
    * all-zero vector yields NULL, not an ANSI DIVIDE_BY_ZERO job failure
    * (DuckDB float division also yields NULL there).
    */
  def cosine(a: Column, b: Column): Column =
    try_divide(dot(a, b), sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Cosine from PRE-STAGED squared norms. A join re-evaluates expression
    * trees per OUTPUT row, so inlining [[cosine]] into a pair join folds
    * each side's norm once per PAIR — 3× the arithmetic of the dot alone.
    * Staging `norm2` as a column on each side before the join computes it
    * once per ROW; the per-pair value (and the oracle mirror) is
    * unchanged: same dot, same sqrt of the same norm.
    */
  def cosineStaged(a: Column, b: Column, n2a: Column, n2b: Column): Column =
    try_divide(dot(a, b), sqrt(n2a) * sqrt(n2b))

  /** Deterministic integer hyperplane coefficient for (plane p, dim d):
    * ((1103515245·(p·dim + d) + 12345) mod 2001) − 1000 ∈ [−1000, 1000].
    * Pure integer arithmetic → identical in any engine; inlined as literals
    * into the oracle SQL from the same formula.
    */
  def planeCoef(p: Int, dims: Int)(d: Column): Column =
    (lit(1103515245L) * (lit(p.toLong * dims) + d) + lit(12345L)) % lit(2001L) - lit(1000L)

  /** Signed projection of `v` onto hyperplane `p` (fold over dims). */
  def planeDot(v: Column, p: Int, dims: Int): Column =
    aggregate(sequence(lit(1), lit(dims)), lit(0.0), (acc, i) =>
      acc + element_at(v.cast("array<double>"), i) *
        planeCoef(p, dims)(i - lit(1)).cast("double"))

  /** LSH bucket id from `planes` hyperplane sign bits — the native
    * codegen'd [[graft.functions.LshBucket]]: coefficient planes live in
    * the expression object and the projections run as generated loops
    * (the Column form re-derives every coefficient interpreted, per row ×
    * plane × dim, because the coef expression references the fold's
    * lambda variable and so never constant-folds). Bit-equal to
    * [[lshBucketViaColumns]] (VectorSpec; v2/v3 oracles).
    */
  def lshBucket(v: Column, planes: Int, dims: Int): Column =
    graft.functions.Lsh.bucket(v, planes, dims)

  /** The Column formulation of [[lshBucket]] — the equivalence witness
    * and the oracle's shape.
    */
  private[graft] def lshBucketViaColumns(v: Column, planes: Int, dims: Int): Column =
    (0 until planes)
      .map(p => when(planeDot(v, p, dims) > 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Per-query top-k WITHOUT a global sort: [[graft.functions.TopKByScore]]
    * — a bounded-heap native aggregate — keeps k entries per (query,
    * partition) with map-side partial aggregation, so only `partitions ×
    * queries × k` heap entries cross the wire and nothing is ever sorted
    * beyond the final k rows per query. The windowed formulation
    * (`row_number() OVER (PARTITION BY query_id)`) must shuffle AND SORT
    * every scored row — measured at a 10 M-vector ADC scan the sort
    * dominated the whole pass; the aggregate streams it in one pass.
    * Output is identical (same rows, ranks, tie-breaks — asserted against
    * [[topKPerQueryViaWindows]] in VectorSpec; the v1-v7 oracles pin it
    * end-to-end).
    */
  private[graft] def topKPerQuery(scored: DataFrame, k: Int, scoreCol: String): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.TopK.topK(col(scoreCol), col("neighbor_id"), k).as("__top"))
      .select(col("query_id"), posexplode(col("__top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as(scoreCol))

  /** The window formulation of [[topKPerQuery]] — the independent
    * equivalence witness (and the shape the DuckDB oracles use).
    */
  private[graft] def topKPerQueryViaWindows(scored: DataFrame, k: Int,
      scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col(scoreCol).desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col(scoreCol))
  }

  /** [[bruteTopK]] with the window-ranked tail — for the topKPerQuery
    * equivalence spec only.
    */
  private[graft] def bruteTopKViaWindows(queries: DataFrame, corpus: DataFrame,
      k: Int): DataFrame = {
    val q = broadcast(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        norm2(col("embedding")).as("__n2q")))
    val joined = corpus
      .select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("__n2c"))
      .crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineStaged(col("qv"), col("embedding"),
          col("__n2q"), col("__n2c")).as("cosine"))
    topKPerQueryViaWindows(joined, k, "cosine")
  }

  /** Brute-force cosine top-k: broadcast the query set, one corpus pass,
    * per-query ranking (ties broken by neighbor id).
    */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(
      queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        norm2(col("embedding")).as("__n2q")))
    // NOTE on the staged corpus norm: whole-stage codegen fuses this
    // projection into the join's per-pair consume, so __n2c actually
    // re-folds once per (row, query) — an exchange here would make the
    // staging literal, but shipping RAW 256-byte vectors through a
    // shuffle costs more than the re-fold (measured at 10 M rows:
    // repartitioned 48 s vs fused 35 s), and at 100 TB you never shuffle
    // the full corpus. The PQ paths get the exchange instead — their
    // codes are 32x smaller (see pqTopK). The 100 TB form of staging for
    // raw vectors is storing the norm as a table column at write time.
    val joined = corpus
      .select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("__n2c"))
      .crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineStaged(col("qv"), col("embedding"),
          col("__n2q"), col("__n2c")).as("cosine"))
    topKPerQuery(joined, k, "cosine")
  }

  /** LSH-bucketed top-k: both sides keyed by bucket, equi-join, rank within
    * the probe's bucket only. Recall < 1 by construction; the scale path.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int, dims: Int): DataFrame = {
    val qb = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      norm2(col("embedding")).as("__n2q"),
      lshBucket(col("embedding"), planes, dims).as("bucket"))
    val cb = corpus.select(col("vec_id").as("neighbor_id"), col("embedding"),
      norm2(col("embedding")).as("__n2c"),
      lshBucket(col("embedding"), planes, dims).as("bucket"))
    val joined = qb.join(cb, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineStaged(col("qv"), col("embedding"),
          col("__n2q"), col("__n2c")).as("cosine"))
    topKPerQuery(joined, k, "cosine")
  }

  /** Multi-probe LSH top-k: the probe side also visits every bucket at
    * Hamming distance 1 from its own (flip each plane bit) — recall
    * recovers the near-misses that straddle one hyperplane at the cost of
    * (planes+1)× probe rows; the corpus side stays single-bucket so the
    * index build is unchanged. The standard recall/latency dial for
    * sign-random-projection LSH.
    */
  def lshTopKMultiProbe(queries: DataFrame, corpus: DataFrame, k: Int,
      planes: Int, dims: Int): DataFrame = {
    val qb0 = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      norm2(col("embedding")).as("__n2q"),
      lshBucket(col("embedding"), planes, dims).as("bucket0"))
    val probes = qb0.select(col("query_id"), col("qv"), col("__n2q"), col("bucket0"),
      explode(array((lit(0L) +: (0 until planes).map(p => lit(1L << p))): _*))
        .as("flip"))
      .select(col("query_id"), col("qv"), col("__n2q"),
        col("bucket0").bitwiseXOR(col("flip")).as("bucket"))
    val cb = corpus.select(col("vec_id").as("neighbor_id"), col("embedding"),
      norm2(col("embedding")).as("__n2c"),
      lshBucket(col("embedding"), planes, dims).as("bucket"))
    val joined = probes.join(cb, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineStaged(col("qv"), col("embedding"),
          col("__n2q"), col("__n2c")).as("cosine"))
      .distinct()
    topKPerQuery(joined, k, "cosine")
  }

  /** Driver-side deterministic k-means codebook (Lloyd, FIXED iteration
    * count, no randomness — reproducible on any cluster and exactly
    * mirrorable in SQL):
    *
    *  - training sample = rows with `vec_id % sampleMod == 0` (a stride
    *    sample is the one sampling scheme an oracle can replicate
    *    verbatim; production codebooks train on samples anyway);
    *  - init = the k smallest-vec_id sample vectors, cid = 0..k-1;
    *  - assignment = argmax cosine, ties to the LOWEST cid (the same
    *    `ORDER BY cos DESC, cid` rule the query itself uses);
    *  - update = per-dim mean over members in vec_id order — a
    *    LEFT-TO-RIGHT double fold seeded 0.0, divided by the member
    *    count, so every float op has a fixed association mirrored by
    *    DuckDB's `list_reduce(list_prepend(0.0, …))`; empty clusters
    *    keep their previous centroid.
    *
    * The result is tiny (k × dims doubles) and rides into the plan as a
    * literal — broadcast by construction, never a shuffle.
    *
    * The sample is collected onto the DRIVER, so it is bounded on BOTH
    * sides: at least k rows, and at most `maxSample` rows — the count is
    * checked with a cheap aggregate BEFORE the collect, so pointing a
    * small `sampleMod` at a 10¹⁰-row corpus fails fast with an explicit
    * message instead of OOMing the driver (same guard-rail discipline as
    * [[blockedTopPairs]]'s in-plan block-size assert). 100 k × 128-dim
    * doubles ≈ 100 MB — a comfortable ceiling for Lloyd iterations on the
    * driver; raise it deliberately if you have the heap.
    */
  def kmeansCodebook(corpus: DataFrame, k: Int, iters: Int,
      sampleMod: Long, maxSample: Long = 100000): Array[(Long, Array[Double])] = {
    val strided = corpus.filter(col("vec_id") % sampleMod === 0)
    val sampleRows = strided.count() // 1-row aggregate, no data movement
    require(sampleRows <= maxSample,
      s"k-means sample ($sampleRows rows at sampleMod=$sampleMod) exceeds " +
        s"maxSample=$maxSample — the sample is collected onto the driver; " +
        "raise sampleMod so the stride sample stays bounded, or raise " +
        "maxSample deliberately")
    val sample: Array[(Long, Array[Double])] = strided
      .select("vec_id", "embedding").orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    require(sample.length >= k,
      s"k-means sample (${sample.length}) smaller than k=$k — lower sampleMod")
    def dotD(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc = acc + a(i) * b(i); i += 1 }; acc
    }
    def norm2D(a: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc = acc + a(i) * a(i); i += 1 }; acc
    }
    def cosD(a: Array[Double], b: Array[Double]): Double =
      dotD(a, b) / (math.sqrt(norm2D(a)) * math.sqrt(norm2D(b)))
    var cents: Array[Array[Double]] = sample.take(k).map(_._2)
    for (_ <- 0 until iters) {
      // argmax cosine, strict > keeps the earliest (lowest) cid on ties
      val assigned: Array[(Int, (Long, Array[Double]))] = sample.map { case (id, v) =>
        var best = 0; var bestCos = cosD(v, cents(0)); var c = 1
        while (c < k) {
          val cs = cosD(v, cents(c))
          if (cs > bestCos) { best = c; bestCos = cs }
          c += 1
        }
        (best, (id, v))
      }
      val byC = assigned.groupBy(_._1)
      cents = Array.tabulate(k) { c =>
        byC.get(c) match {
          case None => cents(c) // empty cluster keeps its centroid
          case Some(members) =>
            val vs = members.map(_._2).sortBy(_._1).map(_._2)
            val dims = vs(0).length
            Array.tabulate(dims) { d =>
              var acc = 0.0; var i = 0
              while (i < vs.length) { acc = acc + vs(i)(d); i += 1 }
              acc / vs.length
            }
        }
      }
    }
    cents.zipWithIndex.map { case (cv, cid) => (cid.toLong, cv) }
  }

  /** V4 — IVF-flat top-k: partition the corpus into inverted lists by
    * nearest centroid, probe only the `nProbe` closest lists per query.
    *
    * The codebook is [[kmeansCodebook]] when `codebook` is given;
    * otherwise the embeddings of the `nCentroids` smallest vec_ids — a
    * deterministic stand-in (production IVF works the same way either
    * way: the codebook is driver-side, tiny, and broadcast). Assignment
    * is a PURE MAP over the corpus — the centroid array is a literal, the
    * argmax a per-row fold — so building the inverted lists costs one
    * pass and zero shuffles; the only shuffle is the probe join on
    * cent_id. Recall/cost dial: nProbe/nCentroids of the corpus is
    * scanned per query (nProbe=4 of 16 lists = 25%), vs 100% for
    * [[bruteTopK]] and bucket-luck for [[lshTopK]].
    */
  /** Coarse IVF assignment: each row of `df` gets its `n` nearest
    * centroids (cosine desc, cid asc — identical tie order to the
    * oracle's `row_number() OVER (ORDER BY cos DESC, cid)`) exploded into
    * `cent_id` rows. A pure map through the native codegen'd
    * [[graft.functions.IvfAssignTopN]]: the codebook lives in the
    * expression OBJECT, not the plan tree — a literal codebook bloats
    * every explain at 16 centroids and becomes a multi-megabyte plan at
    * the thousands a 100 TB index runs — and the top-n selection never
    * allocates or sorts a per-row struct array. Bit-equal to
    * [[ivfAssignViaColumns]] (asserted in VectorSpec; v4/v7/v8 oracles
    * pin it end-to-end).
    */
  private[graft] def ivfAssign(df: DataFrame,
      cents: Array[(Long, Array[Double])], n: Int): DataFrame = {
    val staged = df.select(col("vec_id"), col("embedding"),
      norm2(col("embedding")).as("__n2"))
    staged.select(col("vec_id"), col("embedding"), col("__n2"),
      explode(graft.functions.Ivf.assignTopN(col("embedding"), col("__n2"),
        cents, n)).as("cent_id"))
  }

  /** The Column/HOF formulation of [[ivfAssign]] — the equivalence
    * witness (and the shape the DuckDB oracles mirror CTE-for-CTE).
    */
  private[graft] def ivfAssignViaColumns(df: DataFrame,
      cents: Array[(Long, Array[Double])], n: Int): DataFrame = {
    val centArr = array(cents.map { case (cid, cv) =>
      struct(lit(cid).as("cid"), typedLit(cv).as("cv")) }: _*)
    // (score DESC, NULL last, cid ASC) — NULL scores (try_divide's
    // zero-denominator result, the native expression's NaN) are ranked
    // explicitly so the comparator is total; an implicit fall-through to
    // the cid tie would be non-transitive and array_sort's output
    // undefined on degenerate inputs (ADVICE r4).
    val cmp: (Column, Column) => Column = (l, r) =>
      when(l.getField("cs").isNull && r.getField("cs").isNull,
          when(l.getField("cid") < r.getField("cid"), -1).otherwise(1))
        .when(l.getField("cs").isNull, 1)
        .when(r.getField("cs").isNull, -1)
        .when(l.getField("cs") > r.getField("cs"), -1)
        .when(l.getField("cs") < r.getField("cs"), 1)
        .when(l.getField("cid") < r.getField("cid"), -1)
        .otherwise(1)
    // row norm staged once — the transform would otherwise re-fold it
    // per CENTROID (centroid norms are literals Catalyst constant-folds)
    val staged = df.select(col("vec_id"), col("embedding"),
      norm2(col("embedding")).as("__n2"))
    val scored = transform(centArr, c =>
      struct(cosineStaged(col("embedding"), c.getField("cv"),
        col("__n2"), norm2(c.getField("cv"))).as("cs"),
        c.getField("cid").as("cid")))
    staged.select(col("vec_id"), col("embedding"), col("__n2"),
        explode(slice(array_sort(scored, cmp), 1, n)).as("__a"))
      .select(col("vec_id"), col("embedding"), col("__n2"),
        col("__a.cid").as("cent_id"))
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4,
      codebook: Option[Array[(Long, Array[Double])]] = None): DataFrame = {
    // No caller-supplied codebook → TRAIN one ([[kmeansCodebook]], stride
    // sized from a 1-row count so the driver sample stays ≤ ~50 k rows).
    // The old default — the nCentroids smallest-vec_id embeddings — was a
    // silent recall trap: on a corpus SORTED or CLUSTERED by vec_id those
    // rows all come from one region, every list but one sits empty, and
    // probing returns near-random neighbors (VectorSpec shows the clustered
    // fixture collapsing to ≈chance). Training costs one extra pass over
    // the stride sample and removes the pathology.
    val cents: Array[(Long, Array[Double])] = codebook.getOrElse {
      val n = corpus.count() // 1-row aggregate
      val maxSample = 50000L
      // stride over DENSE-ish vec_ids: mod chosen so ~n/mod <= maxSample;
      // sparse ids just under-sample, and kmeansCodebook fails fast if the
      // sample drops below k.
      val mod = math.max(1L, (n + maxSample - 1) / maxSample)
      kmeansCodebook(corpus, nCentroids, iters = 5, sampleMod = mod,
        maxSample = 2 * maxSample)
    }
    def assign(df: DataFrame, n: Int): DataFrame = ivfAssign(df, cents, n)
    val inv = assign(corpus, 1).select(col("cent_id"),
      col("vec_id").as("neighbor_id"), col("embedding").as("cemb"),
      col("__n2").as("__n2c"))
    val probes = assign(queries, nProbe).select(col("cent_id"),
      col("vec_id").as("query_id"), col("embedding").as("qv"),
      col("__n2").as("__n2q"))
    val scored = probes.join(inv, Seq("cent_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineStaged(col("qv"), col("cemb"),
          col("__n2q"), col("__n2c")).as("cosine"))
    topKPerQuery(scored, k, "cosine")
  }

  /** Per-subspace deterministic k-means codebooks for product quantization:
    * the vector is cut into `m` contiguous subspaces of `dims/m` dims, and
    * each subspace gets its own [[kmeansCodebook]]-style codebook — same
    * stride sample (ONE driver collect, shared by all m trainings, same
    * `maxSample` guard), same fixed-iteration Lloyd, same vec_id-ordered
    * member means and empty-cluster carry — but with SQUARED-L2 assignment
    * (cosine is meaningless on subvectors; L2 is the PQ-standard metric),
    * ties to the lowest cid. Every float op is a left-to-right double fold
    * seeded 0.0, so DuckDB replays the training bit-exactly.
    */
  def pqCodebooks(corpus: DataFrame, m: Int, ksub: Int, iters: Int,
      sampleMod: Long, maxSample: Long = 100000): Array[Array[(Long, Array[Double])]] = {
    val strided = corpus.filter(col("vec_id") % sampleMod === 0)
    val sampleRows = strided.count()
    require(sampleRows <= maxSample,
      s"PQ sample ($sampleRows rows at sampleMod=$sampleMod) exceeds " +
        s"maxSample=$maxSample — the sample is collected onto the driver; " +
        "raise sampleMod or raise maxSample deliberately")
    val sample: Array[(Long, Array[Double])] = strided
      .select("vec_id", "embedding").orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    require(sample.length >= ksub,
      s"PQ sample (${sample.length}) smaller than ksub=$ksub — lower sampleMod")
    val dims = sample(0)._2.length
    require(dims % m == 0, s"dims=$dims not divisible into m=$m subspaces")
    val sub = dims / m
    def l2D(a: Array[Double], off: Int, b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < b.length) {
        val d = a(off + i) - b(i); acc = acc + d * d; i += 1
      }
      acc
    }
    Array.tabulate(m) { j =>
      val off = j * sub
      var cents: Array[Array[Double]] =
        sample.take(ksub).map(_._2.slice(off, off + sub))
      for (_ <- 0 until iters) {
        // argmin L2², strict < keeps the earliest (lowest) cid on ties
        val assigned = sample.map { case (id, v) =>
          var best = 0; var bestD = l2D(v, off, cents(0)); var c = 1
          while (c < ksub) {
            val d = l2D(v, off, cents(c))
            if (d < bestD) { best = c; bestD = d }
            c += 1
          }
          (best, (id, v))
        }
        val byC = assigned.groupBy(_._1)
        cents = Array.tabulate(ksub) { c =>
          byC.get(c) match {
            case None => cents(c)
            case Some(members) =>
              val vs = members.map(_._2).sortBy(_._1).map(_._2)
              Array.tabulate(sub) { d =>
                var acc = 0.0; var i = 0
                while (i < vs.length) { acc = acc + vs(i)(off + d); i += 1 }
                acc / vs.length
              }
          }
        }
      }
      cents.zipWithIndex.map { case (cv, cid) => (cid.toLong, cv) }
    }
  }

  /** V5 — product-quantization top-k with asymmetric distance computation
    * (ADC): the corpus is ENCODED once into `m` small codes (argmin
    * squared-L2 against each subspace codebook — a pure map, the codebooks
    * are literals), and each query scores a candidate from its codes
    * alone: approx dot = Σ_j dot(q_j, centroid_{j,code_j}), approx corpus
    * norm = Σ_j ‖centroid_{j,code_j}‖², approx cosine = adot /
    * (‖q‖·√(Σ‖c‖²)) with the EXACT query norm (the asymmetric half).
    *
    * Scale story (the one that matters at 100 TB): the searchable index is
    * `m` bytes per vector instead of `4·dims` — 32× smaller at 64-dim
    * float, so a corpus whose raw embeddings span a cluster's disks
    * becomes a codes table that fits in MEMORY; encode is one shuffle-free
    * pass, search is the same broadcast-queries single corpus pass as
    * [[bruteTopK]] but over codes (compose with [[ivfTopK]]'s coarse
    * lists to also cut the scanned fraction). Ranking ties break on
    * neighbor_id; all folds (subspace dots, the Σ over j, the argmin
    * distances) are fixed-order expressions, so the scores — and the
    * DuckDB oracle replaying codebook training, encoding, and ADC — are
    * bit-exact.
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      codebooks: Array[Array[(Long, Array[Double])]]): DataFrame = {
    import graft.functions.Pq
    val cbs: Pq.Codebooks = codebooks.map(_.map(_._2))
    // native codegen'd encode + ADC ([[graft.functions.PqEncode]] /
    // [[PqAdcCosine]]): same fold orders as [[pqTopKViaColumns]] and the
    // oracle — bit-equal, ~7x faster warm (HOF lambdas evaluate interpreted)
    // the repartition is a deliberate pipeline break: whole-stage codegen
    // fuses this projection into the broadcast join's per-PAIR consume, so
    // without an exchange PqEncode re-evaluates once per (row, query) —
    // measured 8 queries x 10 M rows: 72 s fused vs 4.4 s encode + 2.6 s
    // scan with the boundary (tools/PqProf2). At scale this exchange is
    // the moral equivalent of writing the codes table — which a real
    // deployment persists anyway.
    val encoded = corpus.select(col("vec_id"),
      Pq.encode(col("embedding"), cbs).as("__codes"))
      .repartition(col("vec_id"))
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"), norm2(col("embedding")).as("__n2q")))
    val scored = encoded.crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        Pq.adcCosine(col("__codes"), col("qv"), col("__n2q"), cbs)
          .as("approx_cosine"))
    topKPerQuery(scored, k, "approx_cosine")
  }

  /** The Column-function formulation of [[pqTopK]] — higher-order-function
    * folds only, no custom expressions. Kept as the independent
    * equivalence witness for the native path (VectorSpec asserts bit-equal
    * output) and as the reference for the oracle's fold orders; ~7×
    * slower warm (HOF lambdas evaluate interpreted, per element).
    */
  private[graft] def pqTopKViaColumns(queries: DataFrame, corpus: DataFrame, k: Int,
      codebooks: Array[Array[(Long, Array[Double])]]): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0)._2.length
    // per-subspace literal centroid arrays
    def centArr(j: Int): Column = array(codebooks(j).map { case (cid, cv) =>
      struct(lit(cid).as("cid"), typedLit(cv).as("cv")) }: _*)
    def subvec(v: Column, j: Int): Column =
      slice(v.cast("array<double>"), j * sub + 1, sub)
    def l2sub(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v)
    // (distance asc, cid asc) — the oracle's ORDER BY d ASC, cid
    val cmp: (Column, Column) => Column = (l, r) =>
      when(l.getField("d") < r.getField("d"), -1)
        .when(l.getField("d") > r.getField("d"), 1)
        .when(l.getField("cid") < r.getField("cid"), -1)
        .otherwise(1)
    // encode: argmin per subspace, then the code's centroid dot/norm terms
    // are resolved from the literal codebooks — everything below is one
    // shuffle-free projection over the corpus
    val codeCols = (0 until m).map { j =>
      element_at(array_sort(
        transform(centArr(j), c =>
          struct(l2sub(subvec(col("embedding"), j), c.getField("cv")).as("d"),
            c.getField("cid").as("cid"))), cmp), 1)
        .getField("cid").as(s"__code$j")
    }
    val encoded = corpus.select(col("vec_id") +: codeCols: _*)
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"), norm2(col("embedding")).as("__n2q")))
    // ADC terms: centroid vector looked up BY CODE from the literal array
    // (codebooks store cid 0..ksub-1 in order, so element_at(code+1) is
    // the cid's centroid); Σ over subspaces is a left-to-right reduce —
    // fixed association, mirrored in the oracle
    def codeCent(j: Int): Column = {
      val cvs = array(codebooks(j).map { case (_, cv) => typedLit(cv) }: _*)
      element_at(cvs, (col(s"__code$j") + lit(1)).cast("int"))
    }
    val adot = (0 until m).map(j => dot(subvec(col("qv"), j), codeCent(j)))
      .reduce(_ + _)
    val cn2 = (0 until m).map(j => norm2(codeCent(j))).reduce(_ + _)
    val scored = encoded.crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        try_divide(adot, sqrt(col("__n2q")) * sqrt(cn2)).as("approx_cosine"))
    topKPerQuery(scored, k, "approx_cosine")
  }

  /** V6 — PQ shortlist + exact re-rank (the FAISS "refine" pattern): ADC
    * ranks the WHOLE corpus from codes alone ([[pqTopK]]), the top
    * `shortlist` candidates per query are then re-scored with the TRUE
    * cosine and re-ranked to the final k. Quantization error now only
    * costs recall when a true neighbor misses the whole shortlist —
    * measured on the sf0.1 embeddings (near-uniform vectors, ANN's worst
    * case): ADC@10 recall 0.45 → refine@100 recall 0.95.
    *
    * Scale shape: the ADC pass touches only the 32×-compressed codes; the
    * refine join fetches `queries × shortlist` true vectors in ONE corpus
    * scan against the broadcast shortlist (at 100 TB: a point-lookup
    * against the vector store). Exact-cosine re-rank reuses the staged
    * norms, so the final scores are bit-identical to [[bruteTopK]]'s for
    * the same pairs — the oracle replays shortlist and re-rank verbatim.
    */
  def pqRefineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      shortlist: Int, codebooks: Array[Array[(Long, Array[Double])]]): DataFrame =
    rerankExact(queries, corpus, k,
      pqTopK(queries, corpus, shortlist, codebooks)
        .select(col("query_id"), col("neighbor_id")))

  /** Exact-cosine re-rank of a `(query_id, neighbor_id)` shortlist: fetch
    * the true vectors in one corpus scan against the broadcast shortlist,
    * score with staged norms (bit-identical to [[bruteTopK]] for the same
    * pairs), keep the top k per query.
    */
  private[graft] def rerankExact(queries: DataFrame, corpus: DataFrame, k: Int,
      cand: DataFrame): DataFrame = {
    val fetched = corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cemb"), norm2(col("embedding")).as("__n2c"))
      .join(broadcast(cand), Seq("neighbor_id"))
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"), norm2(col("embedding")).as("__n2q")))
    val scored = fetched.join(q, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineStaged(col("qv"), col("cemb"),
          col("__n2q"), col("__n2c")).as("cosine"))
    topKPerQuery(scored, k, "cosine")
  }

  /** V7 — IVF-PQ with refine (the full production ANN index, FAISS's
    * IndexIVFPQ + refine): the coarse quantizer prunes the SCAN (only
    * `nProbe`/`nCentroids` of the corpus is touched per query), PQ codes
    * compress what is scanned (`m` bytes per vector in the candidate
    * pass), and the exact re-rank of the ADC shortlist restores recall.
    * At 100 TB this is the composition that works: inverted lists bound
    * I/O, codes bound memory, and the refine join touches only
    * `queries × shortlist` raw vectors.
    *
    * Everything deterministic and oracle-replayed: coarse assignment =
    * [[ivfAssign]] (cosine, ties to lowest cid), codes = [[graft.functions.PqEncode]],
    * ADC = [[graft.functions.PqAdcCosine]], shortlist ties broken on
    * neighbor_id, re-rank = exact staged-norm cosine.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      coarse: Array[(Long, Array[Double])],
      codebooks: Array[Array[(Long, Array[Double])]],
      nProbe: Int = 4, shortlist: Int = 100): DataFrame = {
    import graft.functions.Pq
    val cbs: Pq.Codebooks = codebooks.map(_.map(_._2))
    // pipeline break before the probe join — see pqTopK: without it the
    // fused join re-evaluates PqEncode per matched probe pair
    val inv = ivfAssign(corpus, coarse, 1)
      .select(col("cent_id"), col("vec_id").as("neighbor_id"),
        Pq.encode(col("embedding"), cbs).as("__codes"))
      .repartition(col("neighbor_id"))
    val probes = ivfAssign(queries, coarse, nProbe)
      .select(col("cent_id"), col("vec_id").as("query_id"),
        col("embedding").as("qv"), col("__n2").as("__n2q"))
    val cand = topKPerQuery(
      probes.join(inv, Seq("cent_id"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          Pq.adcCosine(col("__codes"), col("qv"), col("__n2q"), cbs)
            .as("approx_cosine")),
      shortlist, "approx_cosine")
      .select(col("query_id"), col("neighbor_id"))
    rerankExact(queries, corpus, k, cand)
  }

  /** The scale dial for every blocked pairwise stage ([[blockedTopPairs]],
    * [[semanticDropList]]): size the block COUNT so the expected block
    * holds ~`targetBlockRows`. With block size bounded, total pairwise
    * work is ∝ corpus × targetBlockRows — LINEAR in corpus — where a
    * FIXED block count makes it quadratic (the sf1 gate measured exactly
    * that: d5/d7 ran 21–31× at 10× data with their oracle-pinned fixed
    * blocks; see BASELINE.md). Skew can still concentrate a list —
    * [[VectorIndex.imbalance]] is the census and the in-plan
    * `maxBlockRows` guard stays the backstop. Driver-side Lloyd training
    * bounds k in practice (~thousands); beyond that, train hierarchically
    * or reuse a persisted index's coarse quantizer.
    */
  def blocksFor(corpusRows: Long, targetBlockRows: Long = 4096): Int = {
    require(corpusRows >= 0 && targetBlockRows > 0)
    math.max(1, math.ceil(corpusRows.toDouble / targetBlockRows).toInt)
  }

  /** Blocked most-similar pairs: all pairs within a block (IVF-style coarse
    * partition), global top-n by cosine (deterministic tiebreak on ids).
    *
    * Guard rail: the block is the caller's foot-gun — pairs grow as the
    * SQUARE of block size, so one hot block (say 10 M rows in a 100 M-row
    * corpus) is 5·10¹³ comparisons. `maxBlockRows` embeds an `assert_true`
    * in the plan (per-block counts ride the join's own hash partitioning —
    * no extra action, no driver round-trip): an oversized block fails the
    * job with an explicit message instead of silently running for days.
    * Raise it deliberately, or use more/finer blocks (IVF centroids).
    */
  @deprecated("a caller-fixed block column makes pair work QUADRATIC in " +
    "the corpus (BENCH_sf10: 68.8x for 10x data); use nearDupTopPairs " +
    "with a blocksFor(corpusRows, target)-sized codebook — the linear " +
    "dial", since = "round 10")
  def blockedTopPairs(df: DataFrame, block: Column, topN: Int,
      maxBlockRows: Long = 100000): DataFrame = blockedTopPairsImpl(
    df, block, topN, maxBlockRows)

  private[graft] def blockedTopPairsImpl(df: DataFrame, block: Column,
      topN: Int, maxBlockRows: Long): DataFrame = {
    val bn = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("blk")))
    val e = df.select(block.as("blk"), col("vec_id"), col("embedding"),
        norm2(col("embedding")).as("__n2"))
      .withColumn("__bn", bn)
    // when the guard passes the cosine flows through UNTOUCHED (no 0.0+x
    // arithmetic that could flip a -0.0 and break oracle bit-exactness);
    // norms are staged per ROW above, not re-folded per pair
    val guarded = when(col("x.__bn") <= maxBlockRows,
      cosineStaged(col("x.embedding"), col("y.embedding"),
        col("x.__n2"), col("y.__n2")))
      .otherwise(raise_error(
        lit(s"blockedTopPairs: a block exceeds maxBlockRows=$maxBlockRows; " +
          "pairs grow quadratically in block size — size the block count " +
          "with VectorOps.blocksFor(corpusRows, targetBlockRows) (train " +
          "that many IVF centroids) or raise maxBlockRows deliberately"))
        .cast("double"))
    e.as("x").join(e.as("y"),
        col("x.blk") === col("y.blk") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id1"), col("y.vec_id").as("vec_id2"),
        guarded.as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id1"), col("vec_id2"))
      .limit(topN)
  }

  /** [[blockedTopPairs]] blocked by a coarse IVF codebook — the public
    * dialed form (README example; oracle-gated as d5b): train the codebook
    * with k = [[blocksFor]](corpus rows, target) and block size stays
    * ~target at any corpus, keeping pair work linear.
    */
  def nearDupTopPairs(corpus: DataFrame,
      coarse: Array[(Long, Array[Double])], topN: Int,
      maxBlockRows: Long = 100000): DataFrame =
    blockedTopPairsImpl(
      ivfAssign(corpus, coarse, 1)
        .select(col("vec_id"), col("embedding"), col("cent_id")),
      col("cent_id"), topN, maxBlockRows)

  /** Semantic near-dup drop list — the embedding-space analog of the
    * MinHash drop list ([[Dedup.dropListFromPairs]]): candidates are
    * pairs sharing a coarse IVF list (blocking = the index's own
    * partition layout, so candidate count is Σ listᵢ², never corpus²),
    * a pair is a duplicate iff its EXACT staged-norm cosine ≥ `tau`, and
    * the greedy keep-lowest-id rule drops the higher id of every
    * duplicate pair. One self-equi-join on cent_id plus a distinct —
    * the same shuffle shape at any corpus size; norms ride from
    * [[ivfAssign]]'s staging so the pair computes only the dot.
    *
    * Recall caveat (same as every blocked near-dup pass, documented not
    * hidden): a pair straddling two coarse lists is not a candidate.
    * Probe more lists (assign with n > 1) to trade candidates for
    * recall, exactly like nProbe on the query path.
    *
    * Guard rail (same discipline as [[blockedTopPairs]]): pairs grow as
    * Σ listᵢ², so a codebook under-provisioned for the corpus — 16 lists
    * against 10 M rows is 6·10¹² comparisons — must FAIL FAST, not run
    * for days. `maxListRows` embeds an in-plan `assert`-style
    * `raise_error` on the per-list count (rides the join's own hash
    * partitioning, no extra action); size `coarse` so lists stay under
    * it, or raise it deliberately.
    */
  def semanticDropList(corpus: DataFrame,
      coarse: Array[(Long, Array[Double])], tau: Double,
      nAssign: Int = 1, maxListRows: Long = 100000): DataFrame = {
    val ln = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("cent_id")))
    val inv = ivfAssign(corpus, coarse, nAssign)
      .select(col("cent_id"), col("vec_id"), col("embedding"), col("__n2"))
      .withColumn("__ln", ln)
    // guard wraps the pair cosine: when lists are within bound the value
    // flows through untouched (bit-exactness for the oracle), otherwise
    // the job fails with the sizing message
    val guarded = when(col("x.__ln") <= maxListRows,
      cosineStaged(col("x.embedding"), col("y.embedding"),
        col("x.__n2"), col("y.__n2")))
      .otherwise(raise_error(
        lit(s"semanticDropList: a coarse list exceeds maxListRows=$maxListRows; " +
          "pairs grow quadratically in list size — train " +
          "VectorOps.blocksFor(corpusRows, targetBlockRows) coarse " +
          "centroids for this corpus or raise maxListRows deliberately"))
        .cast("double"))
    inv.as("x").join(inv.as("y"),
        col("x.cent_id") === col("y.cent_id") &&
          col("x.vec_id") < col("y.vec_id"))
      .filter(guarded >= tau)
      .select(col("y.vec_id").as("drop_id"))
      .distinct()
  }
}
