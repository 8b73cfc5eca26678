package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graftbridge.StreamBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sinks.SnapshotLake

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
  * Usage:
  * {{{
  *   spark.readStream
  *     .format("graft.streaming.SnapshotSourceProvider")
  *     .option("startingVersion", "latest")   // or "earliest" (default)
  *     .option("skipRewrites", "true")        // default false = strict
  *     .load(root)
  * }}}
  */
class SnapshotSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snapshot source needs the lake root: .load(<root>) or " +
        ".option(\"path\", <root>)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val root = rootOf(parameters)
    val m = SnapshotLake.manifest(sqlContext.sparkSession, root, None)
    schema.foreach(s => require(s == m.schema,
      s"graft-snapshot source schema is the manifest's: ${m.schema.simpleString}; " +
        "drop the .schema(...) call"))
    (shortName(), m.schema)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new SnapshotSource(sqlContext.sparkSession, rootOf(parameters),
      parameters.getOrElse("startingVersion", "earliest"),
      parameters.get("skipRewrites").exists(_.toBoolean))
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
    val added = appends.flatMap { m =>
      val parent = SnapshotLake.manifest(spark, root, Some(m.parent))
        .files.map(_.rel).toSet
      m.files.filterNot(f => parent(f.rel))
    }.distinctBy(_.rel)
    val outSchema = ms.lastOption.map(_.schema).getOrElse(schema)
    if (added.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    else {
      val dd = new Path(root, "data").toString
      spark.read.option("basePath", dd).schema(outSchema)
        .parquet(added.map(f => s"$dd/${f.rel}"): _*)
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
