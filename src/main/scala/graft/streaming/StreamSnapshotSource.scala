package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graftbridge.StreamBridge
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sinks.{ManifestFileIndex, SnapshotLake, SnapshotTable}

/** The snapshot lake as a Structured Streaming SOURCE — the read half of
  * the symmetry whose write half is [[SnapshotLake.appendStream]]: the
  * manifest version IS the stream offset, so the lake's own commit log
  * doubles as the replay log and a downstream query tails appends with
  * exactly-once delivery for free (offsets live in the query checkpoint;
  * a re-delivered range is the same manifest diff every time, because
  * reading between two PINNED versions is deterministic).
  *
  * This is the integration seam Delta Lake's streaming source uses (a V1
  * `Source` whose offsets index the transaction log), rebuilt on the
  * graft manifest:
  *
  *   - `getOffset` = latest manifest version — one driver directory
  *     listing, no data touched, no files opened;
  *   - `getBatch(lo, hi)` = [[SnapshotLake.appendsSince]](lo, hi) —
  *     exactly the rows those commits appended, read from exactly the
  *     files their manifests added;
  *   - the first batch (no checkpointed offset) is the FULL pinned
  *     snapshot at the current head (`startingVersion=earliest`, the
  *     default — Delta's initial-snapshot semantics; correct even over a
  *     history holding rewrites, because it reads STATE, not increments),
  *     or only subsequent appends (`startingVersion=latest`);
  *   - a non-append commit (compact/merge/delete/restore) inside a batch
  *     range fails the query LOUDLY, naming the version — a rewrite makes
  *     file provenance ≠ row provenance, so silently re-emitting or
  *     skipping rows are both wrong as defaults. `skipRewrites=true`
  *     opts into Delta's `skipChangeCommits` semantics instead: append
  *     commits in the range are emitted (each diffed against its OWN
  *     parent), rewrite commits are passed over — updates and deletes
  *     simply never reach the stream.
  *
  * Maintenance discipline: with the default strict mode, compaction on a
  * live-streamed lake stops the consumer at its next trigger; restart it
  * with `skipRewrites=true`, or reseed with `startingVersion=latest` and
  * a fresh checkpoint. Vacuum retention must cover consumer lag — a
  * too-aggressive vacuum fails the pinned read loudly ("vacuumed?"), the
  * standard changelog-retention contract.
  *
  * This class is also the lake's BATCH DataSource and DSv2
  * [[org.apache.spark.sql.connector.catalog.TableProvider]] — the one
  * registered name (`graft-snapshot`, via META-INF/services, the
  * Kafka-provider pattern of a single class carrying every personality)
  * serves all four doorways:
  *
  * {{{
  *   // batch read (DSv2 SnapshotTable): manifest-pruned,
  *   // envelope-skipping, partition-pruned — including hive-partitioned
  *   // lakes, which the V1 relation refuses
  *   spark.read.format("graft-snapshot")
  *     .option("versionAsOf", "3")            // optional time travel
  *     .load(root)
  *   // ...including through the catalog:
  *   //   CREATE TABLE bars USING `graft-snapshot` OPTIONS (path '<root>')
  *   //   SELECT ... FROM bars WHERE ts >= ...   -- prunes files
  *   //   INSERT INTO bars SELECT ...            -- ONE manifest commit,
  *   //     footer stats + bloom sidecars inherited from the lake head;
  *   //   INSERT OVERWRITE bars SELECT ...       -- atomic REPLACE
  *   //   (no REFRESH TABLE needed: DSv2 re-resolves the manifest per
  *   //   statement, so out-of-band commits are visible immediately)
  *
  *   // batch write (V1 CreatableRelationProvider — SnapshotTable
  *   // declares no BATCH_WRITE so all four SaveModes keep their
  *   // contracts): append, overwrite = atomic REPLACE; options
  *   // statsCols/bloomCols/partitionCols are comma-separated lists
  *   df.write.format("graft-snapshot").mode("append")
  *     .option("statsCols", "ts,event_id").save(root)
  *
  *   // streaming read (this file's original personality):
  *   spark.readStream
  *     .format("graft-snapshot")
  *     .option("startingVersion", "latest")   // or "earliest" (default)
  *     .option("skipRewrites", "true")        // default false = strict
  *     .load(root)
  *
  *   // streaming write: each micro-batch is one manifest commit with
  *   // the exactly-once (streamId, batchId) discipline — append by
  *   // default, upsert with mergeKeys/versionCol/pruneKey
  *   df.writeStream.format("graft-snapshot")
  *     .option("streamId", "ingest1").option("statsCols", "ts")
  *     .option("checkpointLocation", ckpt).start(root)
  *   // (foreachBatch(SnapshotLake.appendStream/mergeStream) remains the
  *   // library seam for custom batch logic.)
  * }}}
  */
class SnapshotSourceProvider extends StreamSourceProvider with DataSourceRegister
    with RelationProvider with CreatableRelationProvider
    with StreamSinkProvider with TableProvider {

  override def shortName(): String = "graft-snapshot"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snapshot source needs the lake root: .load(<root>) or " +
        ".option(\"path\", <root>)"))

  // ------------------------------------------------ DSv2 TableProvider
  // The batch personalities now resolve through DataSource V2:
  // `spark.read.format(...)` and catalog tables plan a SnapshotTable
  // (manifest-pinned, partition- AND envelope-pruned vectorized scan),
  // SQL INSERT INTO/OVERWRITE land as manifest commits through its
  // V1Write. `df.write.format(...)` still falls back to the V1
  // CreatableRelationProvider below (SnapshotTable declares no
  // BATCH_WRITE — deliberately, so all four save modes keep their
  // contracts), and streaming read/write fall back to the V1
  // Source/Sink personalities (no MICRO_BATCH_READ / STREAMING_WRITE).
  // `spark.sql.sources.useV1SourceList=graft-snapshot` restores the
  // round-11 V1-only behavior wholesale.

  override def supportsExternalMetadata(): Boolean = true

  private def csvOpt(o: CaseInsensitiveStringMap, k: String): Seq[String] =
    Option(o.get(k)).toSeq.flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))

  private def rootOpt(o: CaseInsensitiveStringMap): String =
    Option(o.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft-snapshot needs the lake root: .load(<root>) / " +
        "OPTIONS (path '<root>')"))

  /** `versionAsOf` pins a manifest version; `timestampAsOf` (an ISO
    * timestamp or epoch micros, UTC) resolves one via the manifests'
    * publish mtimes — the path-based twins of the catalog's SQL
    * `VERSION AS OF` / `TIMESTAMP AS OF`. Mutually exclusive.
    */
  private def pinnedVersion(spark: SparkSession, root: String,
      opts: CaseInsensitiveStringMap): Option[Long] = {
    val v = Option(opts.get("versionAsOf")).map(_.toLong)
    val t = Option(opts.get("timestampAsOf")).map { s =>
      val micros = scala.util.Try(s.toLong).getOrElse {
        // normalize both the space- and the 'T'-separated form: a
        // zoneless ISO string gets UTC appended regardless of separator
        val iso = s.trim.replace(" ", "T")
        val i = scala.util.Try(java.time.Instant.parse(iso))
          .getOrElse(java.time.Instant.parse(iso + "Z"))
        i.getEpochSecond * 1000000L + i.getNano / 1000L
      }
      SnapshotLake.versionAt(spark, root, micros).getOrElse(
        throw new IllegalArgumentException(
          s"no snapshot under $root existed at timestampAsOf=$s — the " +
            "first commit is later (or the version was vacuumed)"))
    }
    require(v.isEmpty || t.isEmpty,
      "versionAsOf and timestampAsOf are mutually exclusive")
    v.orElse(t)
  }

  /** Batch CDC read options (round 14): `startingVersion` /
    * `endingVersion` select the rows APPENDED in versions
    * [startingVersion, endingVersion] — the SQL twin of
    * [[SnapshotLake.appendsSince]], sharing its changelog contract: a
    * rewrite (compact/merge/delete) inside the window refuses loudly,
    * because file provenance no longer equals row provenance there.
    * `startingVersion = 1` reads every append since genesis. The window
    * resolves LAZILY (a streaming probe constructs the table without
    * paying or failing the validation — the V1 streaming source owns
    * the `startingVersion = latest` personality).
    */
  private def changesWindow(spark: SparkSession, root: String,
      opts: CaseInsensitiveStringMap): Option[(Long, Option[Long])] = {
    val startStr = Option(opts.get("startingVersion"))
    val endStr = Option(opts.get("endingVersion"))
    // strict parse: only the literal streaming sentinel or a number is
    // accepted — a typo must not silently fall through to a FULL
    // snapshot read where the caller asked for a CDC window
    val start = startStr.map { s =>
      val t = s.trim
      if (t.equalsIgnoreCase("latest")) None // the streaming personality
      else if (t.equalsIgnoreCase("earliest")) Some(1L) // genesis window
      else Some(try t.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"startingVersion must be a version number, 'earliest' or " +
            s"'latest', got '$s'")
      })
    }.flatten
    if (start.isEmpty) {
      // "latest" (the streaming personality) or absent: not a batch window
      require(endStr.isEmpty,
        "endingVersion needs a numeric startingVersion")
      return None
    }
    require(Option(opts.get("versionAsOf")).isEmpty &&
      Option(opts.get("timestampAsOf")).isEmpty,
      "startingVersion/endingVersion and versionAsOf/timestampAsOf are " +
        "mutually exclusive")
    require(start.get >= 1,
      s"startingVersion must be >= 1, got ${start.get}")
    val end = endStr.map(_.toLong)
    Some((start.get, end))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val root = rootOpt(options)
    changesWindow(spark, root, options) match {
      case Some((_, end)) =>
        // the window's output schema IS the newest in-window manifest's —
        // resolvable without the (lazy) window validation
        SnapshotLake.manifest(spark, root, end).schema
      case None =>
        SnapshotLake.manifest(spark, root,
          pinnedVersion(spark, root, options)).schema
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val spark = SparkSession.active
    val root = rootOpt(opts)
    val declaredParts = (partitioning.toSeq.map { t =>
      require(t.name == "identity",
        s"graft-snapshot supports identity partitioning only, got $t")
      t.references()(0).fieldNames().mkString(".")
    } ++ csvOpt(opts, "partitionCols")).distinct
    changesWindow(spark, root, opts) match {
      case Some((start, end)) =>
        val hi = end.orElse(SnapshotLake.latestVersion(spark, root))
        new SnapshotTable(spark, root, hi,
          Option(schema).filter(_.nonEmpty), declaredParts, opts,
          explicitManifest = Some(() =>
            SnapshotLake.appendWindow(spark, root, start - 1, end)))
      case None =>
        new SnapshotTable(spark, root, pinnedVersion(spark, root, opts),
          Option(schema).filter(_.nonEmpty), declaredParts, opts)
    }
  }

  private def cols(parameters: Map[String, String], k: String): Seq[String] =
    parameters.get(k).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))

  /** Batch read: the manifest-pruned relation. Filters pushed into the
    * scan prune data files through the manifest's footer envelopes at
    * planning time ([[graft.sinks.ManifestFileIndex]]); the scan is
    * Spark's vectorized parquet reader. `versionAsOf` pins a snapshot
    * version (time travel); default is the latest.
    */
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    ManifestFileIndex.relation(sqlContext.sparkSession, rootOf(parameters),
      parameters.get("versionAsOf").map(_.toLong))

  /** Batch write, with the snapshot lake's commit semantics per mode:
    * Append = [[SnapshotLake.append]] (one atomic manifest version;
    * creates the lake on first contact), Overwrite =
    * [[SnapshotLake.replace]] (torn-free wholesale replacement),
    * ErrorIfExists/Ignore behave per their contracts against "a lake
    * exists here". Options: `statsCols` (footer min/max envelopes —
    * pass the prune columns!), `bloomCols` (point-lookup sidecars),
    * `partitionCols` (hive layout), `evolve` (widen-only schema
    * evolution on append) — all comma-separated lists but `evolve`.
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    val (stats, blooms, parts) = (cols(parameters, "statsCols"),
      cols(parameters, "bloomCols"), cols(parameters, "partitionCols"))
    val exists = SnapshotLake.latestVersion(spark, root).nonEmpty
    def append(): Unit = SnapshotLake.append(spark, root, data, parts, stats,
      evolve = parameters.get("evolve").exists(_.toBoolean),
      bloomCols = blooms)
    mode match {
      case SaveMode.Append => append()
      case SaveMode.Overwrite =>
        // replace() takes no evolve (schema must match exactly — replace
        // IS the explicit migration path); refusing up front beats
        // silently dropping the option
        require(!parameters.contains("evolve"),
          "graft-snapshot overwrite does not take evolve: a REPLACE " +
            "commits the frame's own schema when the lake is fresh and " +
            "requires an exact schema match otherwise")
        if (exists) SnapshotLake.replace(spark, root, data, parts, stats,
          bloomCols = blooms)
        else append()
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalArgumentException(
          s"a graft-snapshot lake already exists under $root " +
            "(mode=ErrorIfExists) — use append or overwrite")
        else append()
      case SaveMode.Ignore => if (!exists) append()
    }
    // Spark discards this relation (SaveIntoDataSourceCommand returns no
    // rows); a schema-only stub avoids planning a read of a lake the
    // caller may have written hive-partitioned (which the pruned batch
    // relation refuses — partitioned lakes read via SnapshotLake.read).
    val ctx = sqlContext
    new BaseRelation {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = data.schema
    }
  }

  private def cdcRequested(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val root = rootOf(parameters)
    val m = SnapshotLake.manifest(sqlContext.sparkSession, root, None)
    val out =
      if (cdcRequested(parameters)) SnapshotCdcSource.cdcSchema(m.schema)
      else m.schema
    schema.foreach(s => require(s == out,
      s"graft-snapshot source schema is derived: ${out.simpleString}; " +
        "drop the .schema(...) call"))
    (shortName(), out)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    if (cdcRequested(parameters)) {
      require(!parameters.get("skipRewrites").exists(_.toBoolean),
        "readChangeFeed and skipRewrites are mutually exclusive: the " +
          "change feed CLASSIFIES rewrite commits (that is its point), " +
          "skipRewrites passes over them")
      val keyCols = cols(parameters, "keyCols")
      require(keyCols.nonEmpty,
        "readChangeFeed needs keyCols (the columns diff classifies by — " +
          "must be unique per version, the merge/delete key discipline)")
      new SnapshotCdcSource(sqlContext.sparkSession, rootOf(parameters),
        parameters.getOrElse("startingVersion", "earliest"), keyCols)
    } else new SnapshotSource(sqlContext.sparkSession, rootOf(parameters),
      parameters.getOrElse("startingVersion", "earliest"),
      parameters.get("skipRewrites").exists(_.toBoolean))

  /** Streaming WRITE personality: `df.writeStream.format("graft-snapshot")
    * .option("streamId", ...).start(<root>)` — each micro-batch lands as
    * one manifest commit with [[SnapshotLake.appendStream]]'s
    * exactly-once (streamId, batchId) discipline, or as an upsert via
    * [[SnapshotLake.mergeStream]] when `mergeKeys` (+ `versionCol`,
    * `pruneKey`) are set. Same options as the batch write personality
    * (`statsCols`/`bloomCols`/`partitionCols`); `.partitionBy(...)` on
    * the writer composes with `partitionCols`. Append output mode for
    * plain appends; Append or Update for the merge personality (an
    * upsert sink IS the update-mode contract).
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val root = rootOf(parameters)
    val mergeKeys = cols(parameters, "mergeKeys")
    if (mergeKeys.isEmpty)
      require(outputMode == OutputMode.Append(),
        s"graft-snapshot append sink supports Append output mode, got " +
          s"$outputMode — aggregating streams upsert via mergeKeys, or " +
          "land through foreachBatch(SnapshotLake.mergeStream(...))")
    else require(outputMode == OutputMode.Append() ||
        outputMode == OutputMode.Update(),
      s"graft-snapshot merge sink supports Append|Update output modes, " +
        s"got $outputMode")
    val parts = (partitionColumns ++ cols(parameters, "partitionCols")).distinct
    val streamId = parameters.getOrElse("streamId", "s0")
    val handler: (DataFrame, Long) => Unit =
      if (mergeKeys.nonEmpty) {
        val versionCol = parameters.getOrElse("versionCol",
          throw new IllegalArgumentException(
            "graft-snapshot merge sink needs versionCol (keep-latest order)"))
        val pruneKeys = cols(parameters, "pruneKey")
        require(pruneKeys.nonEmpty, // CSV: composite pruning (round 16)
          "graft-snapshot merge sink needs pruneKey (one or more of " +
            "mergeKeys, comma-separated)")
        SnapshotLake.mergeStreamComposite(root, mergeKeys, versionCol,
          pruneKeys, parts, streamId,
          evolve = parameters.get("evolve").exists(_.toBoolean),
          autoCompactSidecars = parameters.get("autoCompactSidecars")
            .map(_.toInt).getOrElse(0))
      } else {
        SnapshotLake.appendStream(root, parts, cols(parameters, "statsCols"),
          streamId, bloomCols = cols(parameters, "bloomCols"))
      }
    new SnapshotSink(root, streamId, handler)
  }
}

/** V1 streaming sink wrapper: re-wraps the micro-batch as a BATCH frame
  * (the plan arrives with the streaming bit set, which `df.write` inside
  * the lake's stage step would refuse) and hands it to the exactly-once
  * (streamId, batchId) handler — the same code path `foreachBatch(
  * SnapshotLake.appendStream(...))` users run, now behind the registered
  * format name.
  */
class SnapshotSink(root: String, streamId: String,
    handler: (DataFrame, Long) => Unit) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit =
    handler(StreamBridge.asBatch(data), batchId)
  override def toString: String = s"SnapshotSink[$root, stream=$streamId]"
}

class SnapshotSource(spark: SparkSession, root: String,
    startingVersion: String, skipRewrites: Boolean) extends Source {

  require(startingVersion == "earliest" || startingVersion == "latest",
    s"startingVersion must be earliest|latest, got $startingVersion")

  // resolved once at source creation: with `latest`, everything at or
  // below this version is history the stream skips
  private val initialHead: Long =
    SnapshotLake.latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"no committed snapshot under $root — create the lake (one append) " +
          "before streaming from it"))

  override val schema: StructType =
    SnapshotLake.manifest(spark, root, Some(initialHead)).schema

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case SerializedOffset(json) => json.trim.toLong
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] =
    SnapshotLake.latestVersion(spark, root).map(LongOffset(_))

  /** Append-commit rows in (lo, hi], rewrite commits passed over: each
    * append manifest diffs against its OWN parent (not the range base),
    * so a file an append added and a later compact dropped still counts
    * — it stays readable on disk until vacuum, which is exactly the
    * retention window the changelog contract demands.
    */
  private def appendsSkippingRewrites(lo: Long, hi: Long): DataFrame = {
    val ms = SnapshotLake.versions(spark, root)
      .filter(v => v > lo && v <= hi)
      .map(v => SnapshotLake.manifest(spark, root, Some(v)))
    val appends = ms.filter(_.op.startsWith("append"))
    val last = ms.lastOption
    val outSchema = last.map(_.schema).getOrElse(schema)
    // entries appended BEFORE a mid-window field-id migration carry no
    // idless flag in their source manifests — stamp it so the read
    // resolves them by the name mapping, not by ids they do not carry
    val outHasIds = SnapshotLake.schemaHasFieldIds(outSchema)
    val added = appends.flatMap { m =>
      val parent = SnapshotLake.manifest(spark, root, Some(m.parent))
        .files.map(_.rel).toSet
      val idless = outHasIds && !SnapshotLake.schemaHasFieldIds(m.schema)
      m.files.filterNot(f => parent(f.rel))
        .map(f => if (idless && !f.idless) f.copy(idless = true) else f)
    }.distinctBy(_.rel)
    if (added.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    else {
      // read through the ONE library primitive: the column-mapped
      // field-id guard, the name-mapping split, and the (vacuously
      // empty here — appends carry no deletes) position-delete
      // application all ride along instead of being re-derived
      val outM = last.getOrElse(
        SnapshotLake.manifest(spark, root, Some(hi)))
      SnapshotLake.readEntries(spark, root,
        outM.copy(schema = outSchema, files = added), added)
    }
  }

  private def increment(lo: Long, hi: Long): DataFrame =
    if (lo >= hi) SnapshotLake.read(spark, root, Some(hi)).limit(0)
    else if (skipRewrites) appendsSkippingRewrites(lo, hi)
    else SnapshotLake.appendsSince(spark, root, lo, Some(hi))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val hi = ver(end)
    val batch = start match {
      case Some(s) => increment(ver(s), hi)
      case None if startingVersion == "latest" => increment(initialHead, hi)
      case None =>
        // initial snapshot: the full pinned state at hi
        SnapshotLake.read(spark, root, Some(hi))
    }
    StreamBridge.asStreamingBatch(batch)
  }

  override def stop(): Unit = ()

  override def toString: String = s"SnapshotSource[$root]"
}

/** Streaming ROW-LEVEL CDC (round 16) — the `readChangeFeed` personality
  * of `graft-snapshot`, closing the cdc1→cdc3 ladder: where
  * [[SnapshotSource]] either fails on rewrite commits (strict) or passes
  * over them (`skipRewrites` — updates and deletes silently never reach
  * the stream), this source CLASSIFIES every commit: each trigger emits
  * [[SnapshotLake.diff]]'s full insert/update/delete rows for every
  * version in its offset range, `_change_type`-tagged and
  * `_commit_version`-stamped — Delta's `readChangeFeed` on
  * `readStream`, derived from the manifest diff instead of write-time
  * CDC files:
  *
  * {{{
  *   spark.readStream.format("graft-snapshot")
  *     .option("readChangeFeed", "true")
  *     .option("keyCols", "event_id")       // diff's key discipline
  *     .option("startingVersion", "latest") // or earliest (default)
  *     .load(root)
  *   // -> <data cols...>, _change_type, _commit_version
  * }}}
  *
  * Contract notes:
  *   - versions diff PAIRWISE (v-1, v), so a key updated twice inside
  *     one trigger's range emits TWO update rows with distinct
  *     `_commit_version`s — the full change history, not the window's
  *     net effect;
  *   - a compact/restat/evolve (rewrites to the same rows, metadata
  *     commits) diffs as ZERO change rows by reading only the rewritten
  *     slice — maintenance never floods or stops the feed;
  *   - `startingVersion=earliest` seeds with the full initial snapshot
  *     as `insert` rows (Delta's initial-snapshot semantics);
  *     `latest` emits only post-start changes;
  *   - exactly-once across restarts for free: offsets are manifest
  *     versions in the query checkpoint, and a diff between two PINNED
  *     versions is deterministic;
  *   - retention: every version in a pending range (and each one's
  *     parent) must still be retained — an over-aggressive vacuum fails
  *     the pinned diff loudly, the standing changelog-retention rule;
  *   - the output schema is fixed at stream start; columns added by a
  *     later evolve are dropped from the feed (rows stay correct under
  *     the narrower schema — widen-only evolution) until the consumer
  *     restarts with a fresh source.
  */
class SnapshotCdcSource(spark: SparkSession, root: String,
    startingVersion: String, keyCols: Seq[String]) extends Source {

  require(startingVersion == "earliest" || startingVersion == "latest",
    s"startingVersion must be earliest|latest, got $startingVersion")

  private val initialHead: Long =
    SnapshotLake.latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"no committed snapshot under $root — create the lake (one " +
          "append) before streaming changes from it"))

  private val tableSchema: StructType =
    SnapshotLake.manifest(spark, root, Some(initialHead)).schema

  keyCols.foreach(k => require(tableSchema.fieldNames.contains(k),
    s"key column $k not in snapshot schema ${tableSchema.simpleString}"))

  override val schema: StructType = SnapshotCdcSource.cdcSchema(tableSchema)

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case SerializedOffset(json) => json.trim.toLong
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] =
    SnapshotLake.latestVersion(spark, root).map(LongOffset(_))

  private val fns = org.apache.spark.sql.functions
  private def outCols = tableSchema.fieldNames.toSeq
    .map(org.apache.spark.sql.functions.col)

  private def empty(hi: Long): DataFrame =
    SnapshotLake.read(spark, root, Some(hi)).limit(0)
      .select(outCols: _*)
      .withColumn("_change_type", fns.lit("insert"))
      .withColumn("_commit_version", fns.lit(hi))

  /** The classified change rows of versions (lo, hi], one pairwise diff
    * per committed version — unioned lazily (one Spark job per trigger,
    * each diff reading only the files its commit touched).
    */
  private def changes(lo: Long, hi: Long): DataFrame = {
    val vs = SnapshotLake.versions(spark, root).filter(v => v > lo && v <= hi)
    val per = vs.map { v =>
      SnapshotLake.diff(spark, root, v - 1, v, keyCols)
        .select(outCols :+ fns.col("change").as("_change_type"): _*)
        .withColumn("_commit_version", fns.lit(v))
    }
    per.reduceOption(_.unionByName(_)).getOrElse(empty(hi))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val hi = ver(end)
    val batch = start match {
      case Some(s) => changes(ver(s), hi)
      case None if startingVersion == "latest" => changes(initialHead, hi)
      case None =>
        // initial snapshot: every live row at hi as an insert, then the
        // stream continues incrementally from hi
        SnapshotLake.read(spark, root, Some(hi))
          .select(outCols: _*)
          .withColumn("_change_type", fns.lit("insert"))
          .withColumn("_commit_version", fns.lit(hi))
    }
    StreamBridge.asStreamingBatch(batch)
  }

  override def stop(): Unit = ()

  override def toString: String = s"SnapshotCdcSource[$root]"
}

object SnapshotCdcSource {
  /** The change-feed schema: the table's columns followed by
    * `_change_type` ('insert'|'update'|'delete') and `_commit_version`.
    */
  def cdcSchema(table: StructType): StructType = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField}
    // nullable like the diff's when-chain output, so the declared source
    // schema and every batch's plan agree
    StructType(table.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType)))
  }
}
