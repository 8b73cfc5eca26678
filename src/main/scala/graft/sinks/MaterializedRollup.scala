package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Incrementally-maintained rollup over a [[SnapshotLake]] — the
  * reference's TimescaleDB continuous aggregate (timescaledb_schema.sql:
  * 49-66, hourly OHLCV refreshed with a lag) re-expressed at lake scale:
  * the aggregate TABLE is itself a snapshot lake, and each refresh folds in
  * ONLY the rows appended to the base lake since the last refresh, touching
  * only the aggregate files whose key envelopes overlap the delta.
  *
  * Why this shape at 100 TB: a full `GROUP BY` recompute re-reads the
  * corpus every refresh (cost ∝ lake size); this refresh costs
  * ∝ delta size + overlapping aggregate files. The two pieces that make it
  * sound:
  *
  *  - **Associative state, not finals.** The aggregate lake stores
  *    combinable partials — DECIMAL(38,10) sums (exact, order-independent —
  *    the `exactSum` discipline), min/max, counts, and arg-extremes as
  *    (order, value) pairs — so `combine(state ∪ lift(delta))` equals
  *    `lift(base ∪ delta)` EXACTLY, not approximately. Finals (double sums,
  *    averages) are derived at read time by [[finals]].
  *  - **Provenance from the manifest log.** The delta is
  *    [[SnapshotLake.appendsSince]] bounded at a pinned base head: file
  *    lists are the change log, appends racing the refresh fall into the
  *    next increment, and a non-append base op (compact/merge/delete)
  *    fails the incremental path LOUDLY — [[fullRefresh]] is the documented
  *    fallback (and re-anchors the incremental chain).
  *
  * Refresh bookkeeping rides the aggregate lake's own manifests (op field
  * `mv:base=<v>`), so the MV needs no side-channel state and time travel /
  * restore / vacuum apply to it unchanged. Concurrent refreshers are
  * serialized by the commit lock; the loser detects the winner's newer
  * base anchor under the lock and aborts instead of double-applying the
  * delta.
  */
object MaterializedRollup {

  /** Declarative aggregate spec. All state columns are combinable:
    *
    *  - `n_rows`             count(*)
    *  - `sum_<c>`            DECIMAL(38,10) sum per `sumCols` (exact)
    *  - `min_<c>` / `max_<c>` per `minCols` / `maxCols`
    *  - `ord_min` / `first_<c>` and `ord_max` / `last_<c>` per
    *    `firstCols` / `lastCols` — value at the extreme of `orderCol`
    *    (epoch micros for timestamp orders). Deterministic when
    *    (keyCols, orderCol) is unique in the base, the same contract the
    *    A1 rollup's `min_by`/`max_by` rests on.
    *
    * `pruneKey` must be one of `keyCols` with a numeric/timestamp stats
    * domain: refreshes prune aggregate files by its footer envelope, the
    * same file-level discipline as [[SnapshotLake.merge]].
    */
  final case class Spec(
      keyCols: Seq[String],
      pruneKey: String,
      sumCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil,
      orderCol: Option[String] = None,
      firstCols: Seq[String] = Nil,
      lastCols: Seq[String] = Nil,
      targetRowsPerFile: Long = 4L * 1000 * 1000,
      distinctCols: Seq[String] = Nil,
      hllP: Int = 12,
      // register-lake files are kept SMALLER than rollup files: register
      // rows ≈ min(per-group distinct, 2^p) per group, so the lake can
      // rival the data in row count, and a refresh whose delta overlaps
      // one boundary bucket still reads a whole file — finer files keep
      // that boundary read proportional to the boundary, not the slice
      regRowsPerFile: Long = 1L * 1000 * 1000) {
    require(keyCols.contains(pruneKey),
      s"pruneKey $pruneKey must be one of keyCols ${keyCols.mkString(",")}")
    require(orderCol.nonEmpty || (firstCols.isEmpty && lastCols.isEmpty),
      "firstCols/lastCols need an orderCol")
  }

  private val Dec = "decimal(38,10)"

  private def ordExpr(df: DataFrame, c: String): Column =
    df.schema.fields.find(_.name == c).map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        unix_micros(col(c).cast(TimestampType))
      case _ => col(c).cast("long")
    }

  /** State-grain column names, in output order. */
  def stateCols(spec: Spec): Seq[String] =
    spec.keyCols ++ Seq("n_rows") ++
      spec.sumCols.map(c => s"sum_$c") ++
      spec.minCols.map(c => s"min_$c") ++ spec.maxCols.map(c => s"max_$c") ++
      (if (spec.firstCols.nonEmpty) Seq("ord_min") else Nil) ++
      spec.firstCols.map(c => s"first_$c") ++
      (if (spec.lastCols.nonEmpty) Seq("ord_max") else Nil) ++
      spec.lastCols.map(c => s"last_$c")

  /** Raw base rows → aggregate state at the key grain. */
  def lift(df: DataFrame, spec: Spec): DataFrame = {
    val ord = spec.orderCol.map(ordExpr(df, _))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("n_rows")) ++
        spec.sumCols.map(c => sum(col(c).cast(Dec)).as(s"sum_$c")) ++
        spec.minCols.map(c => min(col(c)).as(s"min_$c")) ++
        spec.maxCols.map(c => max(col(c)).as(s"max_$c")) ++
        (if (spec.firstCols.nonEmpty) Seq(min(ord.get).as("ord_min")) else Nil) ++
        spec.firstCols.map(c => min_by(col(c), ord.get).as(s"first_$c")) ++
        (if (spec.lastCols.nonEmpty) Seq(max(ord.get).as("ord_max")) else Nil) ++
        spec.lastCols.map(c => max_by(col(c), ord.get).as(s"last_$c"))
    df.groupBy(spec.keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select(stateCols(spec).map(col): _*)
  }

  /** State rows → state rows at the same grain (associative fold: partials
    * for the same key merge exactly — decimal sums add, extremes compare,
    * arg-extremes ride their recorded order).
    */
  def combine(states: DataFrame, spec: Spec): DataFrame = {
    val aggs: Seq[Column] =
      Seq(sum(col("n_rows")).as("n_rows")) ++
        spec.sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")) ++
        spec.minCols.map(c => min(col(s"min_$c")).as(s"min_$c")) ++
        spec.maxCols.map(c => max(col(s"max_$c")).as(s"max_$c")) ++
        (if (spec.firstCols.nonEmpty) Seq(min(col("ord_min")).as("ord_min")) else Nil) ++
        spec.firstCols.map(c =>
          min_by(col(s"first_$c"), col("ord_min")).as(s"first_$c")) ++
        (if (spec.lastCols.nonEmpty) Seq(max(col("ord_max")).as("ord_max")) else Nil) ++
        spec.lastCols.map(c =>
          max_by(col(s"last_$c"), col("ord_max")).as(s"last_$c"))
    states.groupBy(spec.keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select(stateCols(spec).map(col): _*)
  }

  /** User-facing finals: decimal sums cast back to double, bookkeeping
    * order columns dropped, `first_`/`last_` prefixes kept (callers alias).
    */
  def finals(state: DataFrame, spec: Spec): DataFrame = {
    val out: Seq[Column] =
      spec.keyCols.map(col) ++ Seq(col("n_rows")) ++
        spec.sumCols.map(c => col(s"sum_$c").cast("double").as(s"sum_$c")) ++
        spec.minCols.map(c => col(s"min_$c")) ++
        spec.maxCols.map(c => col(s"max_$c")) ++
        spec.firstCols.map(c => col(s"first_$c")) ++
        spec.lastCols.map(c => col(s"last_$c"))
    state.select(out: _*)
  }

  // ------------------------------------------------- distinct (HLL) state

  /** Per-group APPROX DISTINCT state — the TimescaleDB continuous
    * aggregate's hyperloglog column at lake scale. ONE companion register
    * lake under the MV root holds ALL `distinctCols`, keyed by
    * (`__col`, keyCols..., slot): registers fold by elementwise max,
    * which is idempotent AND associative, so incremental folds equal the
    * one-shot sketch EXACTLY and at-least-once replays converge with
    * zero bookkeeping. The fold runs BEFORE the anchor-advancing rollup
    * commit: a crash between the two re-folds the same delta (a no-op)
    * on retry, so the register lake can never end up permanently behind
    * a committed anchor.
    *
    * Two scale properties the combined lake buys over the earlier
    * one-lake-per-column layout:
    *  - ONE lock commit per refresh regardless of how many distinct
    *    columns the spec carries (commit constants stop multiplying);
    *  - register files are range-clustered on the MV's own `pruneKey`
    *    (a keyCol the registers carry through), so a time-local delta
    *    folds into ONLY the register files whose envelopes overlap it —
    *    the same file discipline as the rollup itself. The old layout
    *    merged on `slot`, whose [0, 2^p) envelope spans every file by
    *    construction, so every refresh rewrote the WHOLE register lake —
    *    that rewrite was the measured superlinearity at sf10.
    */
  private def hllRegsRoot(mvRoot: String): String = s"$mvRoot/_hll_regs"
  private def legacyHllRoot(mvRoot: String, c: String): String =
    s"$mvRoot/_hll/$c"

  /** Lifted registers for every distinct column, tagged by `__col`. */
  private def registersAll(rows: DataFrame, spec: Spec): DataFrame =
    spec.distinctCols.map { c =>
      graft.operators.Hll.registers(rows, spec.keyCols, col(c), spec.hllP)
        .select(lit(c).as("__col") +:
          (spec.keyCols :+ "slot" :+ "r").map(col): _*)
    }.reduce(_ unionByName _)

  private val CanonicalDistinctTypes: Set[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    Set(StringType, ByteType, ShortType, IntegerType, LongType, BooleanType)
  }

  private def checkDistinctCols(df: DataFrame, spec: Spec): Unit =
    spec.distinctCols.foreach { c =>
      require(c != "__col" && !spec.keyCols.contains("__col"),
        "__col is the register lake's own tag column — rename yours")
      require(df.columns.contains(c),
        s"distinct column $c not in ${df.columns.mkString(",")}")
      require(CanonicalDistinctTypes(df.schema(c).dataType),
        s"distinct column $c (${df.schema(c).dataType.simpleString}) has " +
          "no canonical cross-engine string form — cast or bucket it " +
          "first (same discipline as the profiler's HLL metric)")
    }

  /** Fold `rows`' registers (all distinct columns) into the combined
    * register lake in ONE commit: read only the register files whose
    * `pruneKey` envelope overlaps the delta's [lo, hi] (sound — a
    * register row's group key is the delta row's group key, so a
    * non-overlapping file cannot hold any folded-into group), max-merge
    * against the delta registers, publish behind the read-set-intact
    * guard so racing refreshers never resurrect superseded register
    * files (duplicate (group, slot) rows would double-count in the
    * harmonic sum). Idempotent: re-folding the same rows is a no-op
    * state change.
    */
  /** Phase 1 of the fold, independent of the delta's key range: check
    * the register lake exists (loud legacy-layout message) and
    * materialize the delta's registers + their count. Split out so the
    * refresh can run it CONCURRENTLY with its own range aggregate — both
    * read only the persisted delta (guide §2.6). Caller owns the
    * returned frame's unpersist.
    */
  private def prepareDistinct(spark: SparkSession, mvRoot: String,
      rows: DataFrame, spec: Spec): (DataFrame, Long) = {
    val root = hllRegsRoot(mvRoot)
    if (SnapshotLake.latestVersion(spark, root).isEmpty) {
      spec.distinctCols.find(c =>
        SnapshotLake.latestVersion(spark, legacyHllRoot(mvRoot, c)).nonEmpty)
        .foreach(c => throw new IllegalStateException(
          s"$mvRoot carries the legacy one-lake-per-column register " +
            s"layout (_hll/$c) — run fullRefresh to rebuild the combined " +
            "_hll_regs lake"))
      throw new IllegalStateException(
        s"no register lake under $mvRoot — init/fullRefresh creates it")
    }
    val delta = registersAll(rows, spec).persist()
    (delta, delta.count())
  }

  /** Phase 2: fold prepared delta registers into the register lake once
    * the delta's [lo, hi] key range is known.
    */
  private def foldDistinctPrepared(spark: SparkSession, mvRoot: String,
      delta: DataFrame, nDelta: Long, spec: Spec, lo: Double,
      hi: Double): Unit = {
    if (nDelta == 0) return // all distinct values null in this delta
    val root = hllRegsRoot(mvRoot)
    locally {
      SnapshotLake.retryOnConflict(spark, root, "hll-fold") { () =>
        val m = SnapshotLake.manifest(spark, root, None)
        val (overlap, untouched) = m.files.partition(f =>
          f.stats.get(spec.pruneKey).forall { case (fLo, fHi) =>
            fHi >= lo && fLo <= hi })
        val existing =
          if (overlap.isEmpty)
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
          else {
            val dd = new org.apache.hadoop.fs.Path(root, "data").toString
            spark.read.option("basePath", dd).schema(m.schema)
              .parquet(overlap.map(f => s"$dd/${f.rel}"): _*)
          }
        // persist: cluster()'s repartitionByRange SAMPLES its input, so an
        // uncached fold would re-read the overlap register files and
        // re-run the max-merge a second time for the write (measured
        // +~16 s at sf10 before this cache)
        val folded = graft.operators.Hll.mergeRegisters(existing, delta,
          "__col" +: spec.keyCols).persist()
        val boundRows = overlap.map(f => math.max(0L, f.rows)).sum + nDelta
        val newFiles =
          try SnapshotLake.stageFiles(spark, root,
            cluster(folded, spec, boundRows, spec.regRowsPerFile),
            Nil, Set(spec.pruneKey))
          finally folded.unpersist()
        val overlapSet = SnapshotLake.readSetOf(overlap)
        SnapshotLake.commit(spark, root, "merge:hll-fold", m.schema,
          build = head => newFiles ++
            SnapshotLake.requireReadSetIntact(overlapSet, head, newFiles,
              "hll-fold", root)
              .filterNot(f => overlapSet.contains(f.rel)),
          lockExpiryMs = 10L * 60 * 1000)
        untouched.size // for the compiler; callers don't consume it
      }
    }
  }

  /** REPLACE the combined register lake from a full base read
    * (init/fullRefresh). A legacy per-column `_hll/<c>` tree, if present,
    * is simply orphaned (the new layout reads only `_hll_regs`).
    */
  private def replaceDistinct(spark: SparkSession, mvRoot: String,
      base: DataFrame, spec: Spec): Unit = {
    if (spec.distinctCols.isEmpty) return
    val regs = registersAll(base, spec).persist()
    try {
      val n = regs.count()
      SnapshotLake.replace(spark, hllRegsRoot(mvRoot),
        cluster(regs, spec, n, spec.regRowsPerFile),
        statsCols = Seq(spec.pruneKey))
    } finally regs.unpersist()
  }

  /** Run `distinctWork` (register replace/fold) on a side thread while
    * `stage` (the rollup file staging) runs on the caller's — both are
    * joined before returning, so the caller's anchor-advancing commit
    * still happens strictly after the register work (the crash-safety
    * ordering). With no distinct columns the side thread is skipped
    * entirely. Spark handles concurrent jobs from driver threads natively
    * (guide §2.6); the two sides touch different lakes.
    */
  private def overlapWithDistinct[A](spark: SparkSession,
      distinctWork: () => Unit, spec: Spec)(stage: => A): A = {
    if (spec.distinctCols.isEmpty) return stage
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    val f = pool.submit(new java.util.concurrent.Callable[Unit] {
      override def call(): Unit = distinctWork()
    })
    try {
      val staged = stage
      try f.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          throw Option(e.getCause).getOrElse(e)
      }
      staged
    } finally {
      // a staging failure must not leave the register commit running past
      // this call — join it (its own failure already surfaced above when
      // staging succeeded; when staging threw, staging's exception wins)
      try f.get() catch { case _: Throwable => () }
      pool.shutdown()
    }
  }

  private val AnchorRe = raw"mv:base=(\d+).*".r

  /** Base version the MV head reflects (None before [[init]]). */
  def lastRefreshedBase(spark: SparkSession, mvRoot: String): Option[Long] =
    SnapshotLake.latestVersion(spark, mvRoot).map { _ =>
      SnapshotLake.manifest(spark, mvRoot, None).op match {
        case AnchorRe(v) => v.toLong
        case other => throw new IllegalStateException(
          s"$mvRoot head is not a materialized-rollup commit (op=$other)")
      }
    }

  final case class Refresh(mvVersion: Long, baseVersion: Long,
      deltaRows: Long, filesCombined: Int, filesUntouched: Int)

  /** Build the MV from the full base snapshot (first call), anchored at the
    * base's current head. Also the fallback when the incremental chain is
    * broken by a non-append base op — pass `replace=true` to rebuild over
    * an existing MV (publishes one new version; history preserved).
    */
  def init(spark: SparkSession, baseRoot: String, mvRoot: String, spec: Spec,
      replace: Boolean = false,
      lockExpiryMs: Long = 10L * 60 * 1000): Refresh = {
    require(replace || SnapshotLake.latestVersion(spark, mvRoot).isEmpty,
      s"$mvRoot already has a materialized rollup — use refresh, or " +
        "init(replace=true) to rebuild")
    val baseHead = SnapshotLake.latestVersion(spark, baseRoot).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot under $baseRoot"))
    val baseRead = SnapshotLake.read(spark, baseRoot, Some(baseHead))
    checkDistinctCols(baseRead, spec)
    val state = lift(baseRead, spec).cache()
    try {
      // distinct registers BEFORE the anchor-advancing rollup commit
      // (atomic replace; a crash in between just re-replaces on retry) —
      // but the register build and the rollup staging are INDEPENDENT
      // jobs over different lakes, so run them concurrently (guide §2.6)
      // and join before the commit: ordering guarantee intact, wall =
      // max(register replace, rollup stage) instead of the sum.
      val files = overlapWithDistinct(spark,
        () => replaceDistinct(spark, mvRoot, baseRead, spec),
        spec) {
        SnapshotLake.stageFiles(spark, mvRoot,
          cluster(state, spec, state.count()), Nil, Set(spec.pruneKey))
      }
      val v = SnapshotLake.commit(spark, mvRoot, s"mv:base=$baseHead,init",
        state.schema, build = _ => files, lockExpiryMs)
      Refresh(v, baseHead, -1L, files.size, 0)
    } finally state.unpersist()
  }

  def fullRefresh(spark: SparkSession, baseRoot: String, mvRoot: String,
      spec: Spec): Refresh = init(spark, baseRoot, mvRoot, spec, replace = true)

  /** Fold appends since the last refresh into the MV. Reads ONLY the delta
    * rows plus the MV files whose `pruneKey` envelope overlaps the delta's
    * key range; every other MV file survives by identity. No-op (publishes
    * nothing) when the base head is unchanged. Fails loudly — with
    * [[fullRefresh]] named — when a non-append base op intervened.
    *
    * Distinct-register lead window: the register fold runs BEFORE the
    * anchor-advancing rollup commit (crash-safety: a retry re-folds the
    * same delta, a no-op under max-merge). The asymmetric consequence is
    * that when the rollup commit then ABORTS — `guardAnchor` losing to a
    * rival refresh anchored at an older baseHead, or any later failure —
    * the registers keep the fold and permanently run AHEAD of the MV
    * anchor: until the next successful refresh, [[readFinal]]'s
    * `approx_distinct_*` columns may already include delta rows the
    * `n_rows`/`sum_*` columns do not. Registers can lead the anchor,
    * never trail it; both sides converge at the next refresh that
    * commits (max-merge idempotence makes the early fold harmless).
    */
  def refresh(spark: SparkSession, baseRoot: String, mvRoot: String,
      spec: Spec, lockExpiryMs: Long = 10L * 60 * 1000): Refresh = {
    val anchor = lastRefreshedBase(spark, mvRoot).getOrElse(
      throw new IllegalStateException(s"no materialized rollup under $mvRoot — init first"))
    val baseHead = SnapshotLake.latestVersion(spark, baseRoot).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot under $baseRoot"))
    val mvHead = SnapshotLake.manifest(spark, mvRoot, None)
    if (baseHead == anchor)
      return Refresh(mvHead.version, anchor, 0L, 0, mvHead.files.size)
    val delta0 =
      try SnapshotLake.appendsSince(spark, baseRoot, anchor, Some(baseHead))
      catch {
        case e: IllegalArgumentException => throw new IllegalStateException(
          s"incremental refresh broken (${e.getMessage}) — run fullRefresh " +
            "to re-anchor", e)
      }
    // with distinct columns the delta is read TWICE (rollup lift +
    // register lift) — cache the parquet read; without them it's one pass
    val delta =
      if (spec.distinctCols.nonEmpty) delta0.persist() else delta0
    val deltaState = lift(delta, spec).cache()
    // kick off the register-delta materialization NOW, concurrent with
    // the range aggregate below — phase 1 of the fold reads only the
    // persisted delta, not the delta's key range (guide §2.6); its frame
    // is unpersisted in the outer finally
    checkDistinctCols(delta, spec)
    val regPool =
      if (spec.distinctCols.isEmpty) None
      else Some(java.util.concurrent.Executors.newSingleThreadExecutor())
    val regPrep = regPool.map(_.submit(
      new java.util.concurrent.Callable[(DataFrame, Long)] {
        override def call(): (DataFrame, Long) =
          prepareDistinct(spark, mvRoot, delta, spec)
      }))
    def regJoin(): (DataFrame, Long) =
      try regPrep.get.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          throw Option(e.getCause).getOrElse(e)
      }
    try {
      val dom = SnapshotLake.statsDomain(deltaState.schema, spec.pruneKey)
      // one aggregate serves the prune range, the delta row count AND the
      // delta group count (for output-file sizing — no later count job)
      val range = deltaState.agg(min(dom), max(dom), sum(col("n_rows")),
        count(lit(1))).head
      if (range.isNullAt(0)) { // zero-row appends: anchor-only bump, so
        // steady-state refreshes take the baseHead==anchor fast path
        // instead of re-walking the empty versions forever
        val v = SnapshotLake.commit(spark, mvRoot, s"mv:base=$baseHead",
          mvHead.schema, build = head => {
            guardAnchor(head, anchor, mvRoot)
            head.map(_.files).getOrElse(Nil)
          }, lockExpiryMs)
        return Refresh(v, baseHead, 0L, 0, mvHead.files.size)
      }
      val (lo, hi) = (SnapshotLake.toDoubleStat(range.get(0)),
        SnapshotLake.toDoubleStat(range.get(1)))
      val (overlap, untouched) = mvHead.files.partition(f =>
        f.stats.get(spec.pruneKey).forall { case (fLo, fHi) => fHi >= lo && fLo <= hi })
      val existing =
        if (overlap.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            mvHead.schema)
        else {
          val dd = new org.apache.hadoop.fs.Path(mvRoot, "data").toString
          spark.read.option("basePath", dd).schema(mvHead.schema)
            .parquet(overlap.map(f => s"$dd/${f.rel}"): _*)
        }
      val combined = combine(existing.unionByName(deltaState), spec)
      // combined's row count is bounded by overlap-state rows (exact, from
      // the manifest's footer counts) + delta groups (from the one agg
      // above) — keys on both sides merge, so this only ever OVER-sizes
      // the range partitioning, and empty ranges write no file. Sizing
      // from metadata saves the count job (and the cache the count needed)
      // that used to materialize `combined` twice per refresh.
      val boundRows = overlap.map(f => math.max(0L, f.rows)).sum +
        range.getLong(3)
      // cluster()'s repartitionByRange SAMPLES its input before the write
      // consumes it, so without a persist the union+combine aggregate runs
      // twice per refresh — the same double-compute foldDistinct persists
      // `folded` to avoid (its comment cites +16 s measured at sf10).
      // distinct registers BEFORE the anchor-advancing commit (idempotent
      // max-merge: a crash in between re-folds the same delta on retry).
      // The register fold and the rollup staging are independent jobs over
      // different lakes reading the same persisted delta — run them
      // concurrently (guide §2.6) and join before the commit; an abort
      // after the fold leaves registers LEADING the anchor, which the
      // lead-window contract above already allows.
      val combinedP = combined.persist()
      val newFiles = try {
        overlapWithDistinct(spark,
          () => {
            val (regDelta, nRegs) = regJoin()
            foldDistinctPrepared(spark, mvRoot, regDelta, nRegs, spec, lo, hi)
          }, spec) {
          SnapshotLake.stageFiles(spark, mvRoot,
            cluster(combinedP, spec, boundRows), Nil, Set(spec.pruneKey))
        }
      } finally combinedP.unpersist()
      val overlapSet = overlap.map(_.rel).toSet
      val nDelta = range.getLong(2)
      val v = SnapshotLake.commit(spark, mvRoot, s"mv:base=$baseHead",
        mvHead.schema, build = head => {
          guardAnchor(head, anchor, mvRoot)
          newFiles ++ head.map(_.files).getOrElse(Nil)
            .filterNot(f => overlapSet.contains(f.rel))
        }, lockExpiryMs)
      Refresh(v, baseHead, nDelta, overlap.size, untouched.size)
    } finally {
      // join + release the register-delta prep on every exit path (the
      // zero-append early return and failures included); its own failure
      // already surfaced through regJoin on the fold path, so it is
      // swallowed here
      regPrep.foreach(f =>
        try f.get()._1.unpersist() catch { case _: Throwable => () })
      regPool.foreach(_.shutdown())
      deltaState.unpersist()
      if (spec.distinctCols.nonEmpty) delta.unpersist()
    }
  }

  /** Range-cluster MV state on the prune key before staging so each data
    * file carries a TIGHT pruneKey footer envelope — that clustering is
    * what lets a time-local delta refresh skip the rest of the aggregate
    * lake entirely (the MV analog of Z-ordering the fact lake). File count
    * is sized from `rows` (`targetRowsPerFile`), not left to AQE, which
    * would happily coalesce a small-but-growing MV into one file and
    * erase the envelope index; an upper-bound `rows` merely over-splits
    * (empty ranges write nothing).
    */
  private def cluster(state: DataFrame, spec: Spec, rows: Long,
      perFile: Long = 0L): DataFrame = {
    val target = if (perFile > 0) perFile else spec.targetRowsPerFile
    val n = math.max(1L, (rows + target - 1) / target)
    state.repartitionByRange(n.toInt, col(spec.pruneKey))
  }

  /** Under the commit lock: abort if a rival refresh advanced the anchor
    * past ours — folding our delta over ITS files would double-count.
    */
  private def guardAnchor(head: Option[SnapshotLake.Manifest], anchor: Long,
      mvRoot: String): Unit =
    head.map(_.op).foreach {
      case AnchorRe(v) => require(v.toLong == anchor,
        s"concurrent refresh of $mvRoot won (anchor $v, ours $anchor) — retry")
      case other => throw new IllegalStateException(
        s"$mvRoot head is not a materialized-rollup commit (op=$other)")
    }

  /** The MV's finals at its current (or a pinned) version, with one
    * `approx_distinct_<c>` DOUBLE column per `distinctCols` entry —
    * estimated from the companion register lakes ([[graft.operators.Hll
    * .estimate]]); groups the registers never saw read NULL. Note the
    * distinct columns always reflect the register lakes' CURRENT state
    * (registers are monotone; pinning them to an MV version would need a
    * version map the monotone merge makes unnecessary for the
    * grows-by-append use) — and that state may LEAD the MV anchor after
    * an aborted refresh (see [[refresh]]'s lead-window note), so a
    * distinct estimate can briefly cover rows the row/sum columns don't.
    */
  def readFinal(spark: SparkSession, mvRoot: String, spec: Spec,
      version: Option[Long] = None): DataFrame = {
    val base = finals(SnapshotLake.read(spark, mvRoot, version), spec)
    if (spec.distinctCols.isEmpty) base
    else {
      val regs = SnapshotLake.read(spark, hllRegsRoot(mvRoot))
      spec.distinctCols.foldLeft(base) { (acc, c) =>
        val est = graft.operators.Hll.estimate(
          regs.filter(col("__col") === c).drop("__col"),
          spec.keyCols, spec.hllP)
          .withColumnRenamed("approx_distinct", s"approx_distinct_$c")
        acc.join(est, spec.keyCols, "left")
      }
    }
  }
}
