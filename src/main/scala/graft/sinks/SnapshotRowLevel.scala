package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, UnsafeProjection}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** SQL `MERGE INTO` / `UPDATE` (and arbitrary-predicate `DELETE`) on
  * snapshot lakes: the GROUP-BASED copy-on-write seam of Spark's
  * row-level-operation framework (the one Iceberg's COW tables use),
  * on the graft manifest — with the group pruned to the files the
  * statement can actually touch, so a small keyed MERGE against a
  * 100 TB lake rewrites megabytes, not the lake.
  *
  * How the pieces meet: the analyzer rewrites the DML into
  * `ReplaceData(query)` where `query` computes every SURVIVING row of
  * the groups the operation's scan read — matched rows modified per the
  * MERGE/UPDATE clauses, unmatched rows passed through — and the
  * operation's [[BatchWrite]] replaces those groups atomically. The
  * group here is a FILE, determined in two sound narrowing passes that
  * both start from the full pinned manifest:
  *
  *   1. STATIC pruning: Spark's `GroupBasedRowLevelOperationScanPlanning`
  *      pushes the target-only conjuncts of the command condition into
  *      [[SnapshotRowLevelScanBuilder]]. They are used ONLY to select
  *      candidate files (manifest envelope overlap + hive partition
  *      values — the same translation as the DELETE doorway); they are
  *      NEVER forwarded as parquet row filters, because a group-based
  *      scan must return every row of each surviving group (a pushed
  *      row filter would silently drop the unmatched rows a COW rewrite
  *      has to carry — the framework discards the residual filters on
  *      this path, so row-dropping here is data loss, not a re-check).
  *   2. RUNTIME group filtering: the operation requires the `_file`
  *      metadata column ([[SnapshotTable.metadataColumns]], served as a
  *      per-file partition value with zero data I/O), and the scan
  *      implements [[SupportsRuntimeV2Filtering]] keyed on it — Spark's
  *      `RowLevelOperationRuntimeGroupFiltering` then runs the
  *      matching-rows subquery (e.g. the MERGE join) first, collects
  *      the distinct `_file` values it touched, and hands them back via
  *      `filter(_file IN ...)`; the scan narrows to exactly those files
  *      before planning its partitions. The subquery plans its own
  *      partitions from the pre-narrowed state (execution order:
  *      subquery completes before the main scan's runtime filter is
  *      applied), mirroring Iceberg's `SparkCopyOnWriteScan`.
  *
  * The [[SnapshotReplaceDataWrite]] commit then replaces exactly the
  * narrowed candidate set in ONE lock commit and carries every other
  * file by IDENTITY — correct under the same read-set-intact guard as
  * every library rewrite (a concurrent rewrite of a candidate aborts
  * the statement loudly; concurrent appends ride through untouched).
  *
  * The write path is a REAL distributed DSv2 write (ReplaceData has no
  * V1 fallback): executors write zstd parquet through Spark's own
  * `ParquetFileFormat.prepareWrite` factory straight into the lake's
  * stage-dir convention — for hive-partitioned lakes each task routes
  * rows to per-partition files (partition columns live in the directory
  * name, not the file, exactly like a library append) — commit messages
  * carry (file, bytes, rows), and the driver publishes through
  * [[SnapshotLake.publishStaged]] + the lock commit — footer stats and
  * bloom sidecars restamped exactly like every other rewrite,
  * crash-safety by the same invisible-stage contract.
  */
final class SnapshotRowLevelOperation(
    spark: SparkSession,
    root: String,
    base: SnapshotLake.Manifest,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  private[sinks] val partCols: Seq[String] = SnapshotTable.partColsOf(base)

  /** Whether the synthetic `_file` column is available (it is unless the
    * lake has a REAL `_file` data column — then runtime group filtering
    * is off and DML degrades gracefully to static pruning only).
    */
  private[sinks] val fileTagged: Boolean =
    !base.schema.fieldNames.contains(SnapshotTable.FileMetaCol)

  /** The files this statement will REPLACE — starts as the full pinned
    * manifest, narrowed by the static prune at scan build and by the
    * runtime `_file IN (...)` filter. Written on the driver only (scan
    * build + runtime filter application), read at commit.
    */
  @volatile private[sinks] var candidates: Seq[SnapshotLake.FileEntry] =
    base.files

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String = s"graft-snapshot $cmd `$root`@v${base.version}"

  /** `_file` in the read relation keys the runtime group filter (and
    * flows through the rewrite query to the writer's metadata
    * projection, which Spark strips before rows reach the files).
    */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    if (fileTagged) Array(Expressions.column(SnapshotTable.FileMetaCol))
    else Array.empty

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SnapshotRowLevelScanBuilder(this, spark, root, base, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new SnapshotReplaceDataWrite(spark, root, base,
            SnapshotRowLevelOperation.this, info.schema,
            cmd.toString.toLowerCase)
      }
    }
}

final class SnapshotRowLevelOperationBuilder(
    spark: SparkSession, root: String, base: SnapshotLake.Manifest,
    info: RowLevelOperationInfo) extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation = {
    // tripwire: deletes exist only on dmlMode=mor lakes, which route to
    // the delta builder — a COW rewrite over delete-carrying files would
    // rebuild groups from its own (delete-aware) scan but the invariant
    // is load-bearing enough to fail loudly on rather than reason about
    require(base.files.forall(_.deletes.isEmpty),
      s"copy-on-write row-level DML over position-delete-carrying files " +
        s"under $root — this lake should be dmlMode=mor; compact() first")
    new SnapshotRowLevelOperation(spark, root, base, info.command)
  }
}

/** The operation's scan builder. Pushed filters (the target-only
  * conjuncts of the command condition) select CANDIDATE FILES only —
  * all of them are returned as post-scan filters, and none reach the
  * parquet reader, so candidate files are always read in full (the
  * group-based contract).
  */
final class SnapshotRowLevelScanBuilder(
    op: SnapshotRowLevelOperation,
    spark: SparkSession,
    root: String,
    base: SnapshotLake.Manifest,
    options: CaseInsensitiveStringMap) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: Option[StructType] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // ALL residual: groups must be scanned whole
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  override def build(): Scan = {
    // column-mapped lakes MUST resolve by field id here: a name-matched
    // read of a renamed column returns NULL from pre-rename files and
    // this scan feeds a rewrite that would commit those NULLs back
    SnapshotLake.requireFieldIdReads(spark, base)
    val box = SnapshotTable.pruneBoxOf(pushed)
    val partVals = SnapshotTable.partitionValuesFrom(pushed, op.partCols,
      spark.sessionState.conf.sessionLocalTimeZone)
    val candidates = base.files.filter { f =>
      box.forall { case (c, (lo, hi)) =>
        f.stats.get(c).forall { case (fLo, fHi) => fHi >= lo && fLo <= hi }
      } && {
        val pv = SnapshotLake.partitionValuesOf(f.rel)
        partVals.forall { case (c, allowed) =>
          pv.get(c).forall(allowed.contains)
        }
      }
    }
    op.candidates = candidates
    new SnapshotRowLevelScan(op, spark, root, base, candidates, required,
      options)
  }
}

/** The operation scan: a stock vectorized parquet scan over the current
  * candidate files (same [[SnapshotPartitioningIndex]] as any table
  * read, so `_file` and hive partition values come from the manifest),
  * rebuilt when the runtime group filter narrows the set.
  */
final class SnapshotRowLevelScan(
    op: SnapshotRowLevelOperation,
    spark: SparkSession,
    root: String,
    base: SnapshotLake.Manifest,
    initial: Seq[SnapshotLake.FileEntry],
    required: Option[StructType],
    options: CaseInsensitiveStringMap) extends Scan with Batch
    with SupportsRuntimeV2Filtering {

  @volatile private var current: Seq[SnapshotLake.FileEntry] = initial
  private var builtFor: Seq[SnapshotLake.FileEntry] = null
  private var inner: Scan = null

  /** Build (or rebuild, after a runtime narrow) the delegate parquet
    * scan. The subquery relation shares this object but plans its
    * partitions BEFORE the runtime filter lands, so per-call rebuild —
    * not a lazy val — is what keeps both readers consistent.
    */
  private def innerScan: Scan = synchronized {
    if (builtFor ne current) {
      val index = new SnapshotPartitioningIndex(spark, root,
        base.copy(files = current))
      val dataSchema = StructType(
        base.schema.fields.filterNot(f => op.partCols.contains(f.name)))
      val sb = ParquetScanBuilder(spark, index, base.schema, dataSchema,
        options)
      required.foreach(sb.pruneColumns)
      inner = sb.build()
      builtFor = current
    }
    inner
  }

  override def readSchema(): StructType = innerScan.readSchema()

  override def toBatch: Batch = this

  override def description(): String =
    s"graft-row-level-scan `$root`@v${base.version} " +
      s"${current.size}/${base.files.size} candidate files"

  override def filterAttributes(): Array[NamedReference] =
    if (op.fileTagged) Array(Expressions.column(SnapshotTable.FileMetaCol))
    else Array.empty

  /** The runtime group filter: `_file IN (<files the matching-rows
    * subquery touched>)`. Narrowing must be EXACT — the rewrite query
    * row-filters on the same predicate, so a file left in the replace
    * set whose rows were filtered out would be dropped without
    * replacement. Anything unrecognized referencing `_file` therefore
    * fails the statement loudly instead of guessing.
    */
  override def filter(predicates: Array[V2Predicate]): Unit = {
    val onFile = predicates.filter(_.references().exists(
      _.fieldNames().sameElements(Array(SnapshotTable.FileMetaCol))))
    if (onFile.isEmpty) return
    val admitted = onFile.map(admittedFiles).reduce(_ intersect _)
    val narrowed = current.filter(f => admitted.contains(f.rel))
    current = narrowed
    op.candidates = narrowed
  }

  private def admittedFiles(p: V2Predicate): Set[String] = {
    def lit(e: org.apache.spark.sql.connector.expressions.Expression): String =
      e match {
        case l: Literal[_] => String.valueOf(l.value)
        case other => throw new IllegalStateException(
          s"runtime group filter on ${SnapshotTable.FileMetaCol}: " +
            s"non-literal child $other — refusing to guess (a wrong " +
            "guess loses rows)")
      }
    p.name() match {
      case "IN" => p.children().drop(1).map(lit).toSet
      case "=" => Set(lit(p.children()(1)))
      case other => throw new IllegalStateException(
        s"runtime group filter on ${SnapshotTable.FileMetaCol}: " +
          s"unsupported predicate $other — refusing to guess (a wrong " +
          "guess loses rows)")
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    innerScan.toBatch.planInputPartitions()

  override def createReaderFactory(): PartitionReaderFactory =
    innerScan.toBatch.createReaderFactory()
}

/** One staged parquet file an executor wrote: data/-relative name +
  * length + rows (zero-row files are never created — a writer opens on
  * its first routed row).
  */
private case class StagedFileInfo(rel: String, bytes: Long, rows: Long)

private case class StagedFilesMessage(files: Seq[StagedFileInfo])
  extends WriterCommitMessage

/** The ReplaceData BatchWrite: replace the operation's (possibly
  * runtime-narrowed) candidate files with the rewrite's output in ONE
  * lock commit; every non-candidate file is carried by IDENTITY —
  * unread, unwritten, unmoved. Concurrent appends ride through (they
  * merge against versions after `base`); a concurrent REWRITE of a
  * candidate fails the read-set guard and aborts this statement loudly —
  * a SQL statement cannot be silently re-run by the committer, so the
  * user re-issues it against the new head.
  */
final class SnapshotReplaceDataWrite(
    spark: SparkSession,
    root: String,
    base: SnapshotLake.Manifest,
    op: SnapshotRowLevelOperation,
    writeSchema: StructType,
    opName: String) extends BatchWrite {

  // the framework must hand us rows in exactly the table's schema — a
  // Spark upgrade that adds projection columns would otherwise land
  // files whose physical schema drifts from the manifest's, silently
  require(writeSchema.fields.map(f => (f.name, f.dataType)).sameElements(
    base.schema.fields.map(f => (f.name, f.dataType))),
    s"row-level write schema ${writeSchema.simpleString} != lake schema " +
      s"${base.schema.simpleString}")

  private val token = java.util.UUID.randomUUID.toString.replace("-", "").take(16)
  private val stageDir = new Path(root, s".stage-$token")

  /** Partition columns live in the directory name; files carry the rest. */
  private val dataSchema = StructType(
    writeSchema.fields.filterNot(f => op.partCols.contains(f.name)))

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    SnapshotLake.requireFieldIdWrites(spark, base.schema)
    val fs = stageDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(stageDir)
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    val factory = new ParquetFileFormat().prepareWrite(spark, job,
      Map("compression" -> "zstd"), dataSchema)
    new SnapshotDataWriterFactory(factory,
      new SerializableConfiguration(job.getConfiguration),
      stageDir.toString, writeSchema, op.partCols,
      spark.sessionState.conf.sessionLocalTimeZone,
      SnapshotLake.boundConstraints(spark, writeSchema, base.props))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = stageDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      // prefix the unique write token on the BASENAME, preserving any
      // hive partition directories the task writers routed into
      def tokened(rel: String): String = {
        val i = rel.lastIndexOf('/')
        if (i < 0) s"$token-$rel" else rel.take(i + 1) + s"$token-" + rel.drop(i + 1)
      }
      val staged = messages.collect {
        case m: StagedFilesMessage => m.files
      }.flatten.collect {
        case StagedFileInfo(rel, bytes, rows) if rows > 0 =>
          (new Path(stageDir, rel), tokened(rel), bytes)
      }.toSeq
      def declared(k: String): Seq[String] = base.props.get(k).toSeq
        .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))
      val statsCols = (base.files.flatMap(_.stats.keys).toSet ++
        declared("statsCols")) -- op.partCols
      val bloomCols = (base.files.flatMap(_.bloomCols) ++
        declared("bloomCols")).distinct.filterNot(op.partCols.contains)
      val newFiles = SnapshotLake.publishStaged(spark, root, staged,
        statsCols, bloomCols)
      // the REPLACED set: exactly the candidate files the statement's
      // scan was narrowed to — every other file survives by identity
      val replaced = SnapshotLake.readSetOf(op.candidates)
      if (replaced.isEmpty && newFiles.isEmpty) return // touched nothing
      try {
        SnapshotLake.commit(spark, root, s"$opName:sql", base.schema,
          build = head => {
            SnapshotLake.requireSchemaIntact(base.schema, head, newFiles,
              s"$opName:sql", root)
            newFiles ++
              SnapshotLake.requireReadSetIntact(replaced, head, newFiles,
                s"$opName:sql", root)
                .filterNot(f => replaced.contains(f.rel))
          },
          lockExpiryMs = 10L * 60 * 1000)
      } catch {
        case e: SnapshotLake.ConflictingRewriteException =>
          // a SQL statement's committer cannot silently re-run the
          // query, so clean the orphaned files and surface the
          // statement-level contract
          e.staged.foreach { f =>
            fs.delete(new Path(root, s"data/${f.rel}"), false)
            f.bloomCols.foreach(c =>
              fs.delete(SnapshotLake.bloomPath(root, f.rel, c), false))
          }
          throw new IllegalStateException(
            s"SQL $opName lost to a concurrent rewrite of the same lake — " +
              s"re-run the statement against the new head (${e.getMessage})")
      }
    } finally fs.delete(stageDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = stageDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(stageDir, true)
  }
}

/** Dynamic partition overwrite (`INSERT OVERWRITE` under
  * `spark.sql.sources.partitionOverwriteMode=dynamic`): replace EXACTLY
  * the hive partitions present in the incoming frame, in ONE atomic
  * manifest commit — the nightly-batch-reload idiom (`replaceWhere` with
  * the predicate derived from the data itself, stray rows impossible by
  * construction because each row IS its partition). Executors route rows
  * to per-partition staged files through the same
  * [[SnapshotDataWriterFactory]] the row-level path uses; at commit the
  * touched partition set is read off the staged directory names, head
  * files in those partitions are dropped, everything else is carried by
  * identity. Stats/bloom columns inherit through the same
  * options → manifest props → head files chain as every SQL write.
  *
  * Spark selects this plan from the session conf alone, so an
  * UNPARTITIONED lake lands here too — there the whole table is the one
  * "partition" and the commit is a full atomic REPLACE, exactly what the
  * plain `INSERT OVERWRITE` form does (Hive's dynamic-mode semantics).
  *
  * Concurrency contract (WriteSerializable, Delta's line): every head
  * file this commit DROPS must have been in the statement-start manifest
  * (`base`). A racing append/rewrite that landed a file into a touched
  * partition (or anywhere, on an unpartitioned lake) between statement
  * start and commit would otherwise be SILENTLY dropped with the
  * partition — that is data loss of a committed write, not overwrite
  * semantics, so the statement aborts loudly and the user re-runs it
  * against the new head (the row-level paths' `requireReadSetIntact`
  * discipline, applied to the dynamically-derived drop set).
  */
final class SnapshotDynamicOverwriteWrite(
    spark: SparkSession,
    root: String,
    base: Option[SnapshotLake.Manifest],
    tableSchema: StructType,
    partCols: Seq[String],
    declaredPartitioning: Seq[String],
    tableOptions: CaseInsensitiveStringMap) extends BatchWrite {

  private val token = java.util.UUID.randomUUID.toString.replace("-", "").take(16)
  private val stageDir = new Path(root, s".stage-$token")

  private val dataSchema = StructType(
    tableSchema.fields.filterNot(f => partCols.contains(f.name)))

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    SnapshotLake.requireFieldIdWrites(spark, tableSchema)
    val fs = stageDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(stageDir)
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    val factory = new ParquetFileFormat().prepareWrite(spark, job,
      Map("compression" -> "zstd"), dataSchema)
    new SnapshotDataWriterFactory(factory,
      new SerializableConfiguration(job.getConfiguration),
      stageDir.toString, tableSchema, partCols,
      spark.sessionState.conf.sessionLocalTimeZone,
      SnapshotLake.boundConstraints(spark, tableSchema,
        base.map(_.props).getOrElse(Map.empty)))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = stageDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      def tokened(rel: String): String = {
        val i = rel.lastIndexOf('/')
        if (i < 0) s"$token-$rel" else rel.take(i + 1) + s"$token-" + rel.drop(i + 1)
      }
      val infos = messages.collect {
        case m: StagedFilesMessage => m.files
      }.flatten.filter(_.rows > 0).toSeq
      // partitioned + empty frame: replace nothing, publish nothing
      // (Delta semantics — there is no partition to derive)
      if (infos.isEmpty && partCols.nonEmpty) return
      val staged = infos.map(f =>
        (new Path(stageDir, f.rel), tokened(f.rel), f.bytes))
      val (_, _, statsCols, bloomCols) = SnapshotTable.writeShape(spark,
        root, declaredPartitioning, tableOptions)
      val newFiles = SnapshotLake.publishStaged(spark, root, staged,
        statsCols.toSet -- partCols,
        bloomCols.filterNot(partCols.contains))
      // the REPLACED partitions: exactly the directory prefixes the
      // frame's own rows routed into; an unpartitioned lake is one
      // "partition" — a full atomic replace
      def dirOf(rel: String): String = rel.take(math.max(rel.lastIndexOf('/'), 0))
      val touched = newFiles.map(f => dirOf(f.rel)).toSet
      val baseSet = base.map(_.files.map(_.rel).toSet).getOrElse(Set.empty)
      SnapshotDynamicOverwriteWrite.beforeCommit()
      try {
        SnapshotLake.commit(spark, root, "overwrite-dynamic", tableSchema,
          build = head => {
            SnapshotLake.requireSchemaIntact(tableSchema, head, newFiles,
              "overwrite-dynamic", root)
            val headFiles = head.map(_.files).getOrElse(Nil)
            val (dropped, carried) =
              if (partCols.isEmpty) (headFiles, Nil)
              else headFiles.partition(f => touched.contains(dirOf(f.rel)))
            // WriteSerializable guard: a file we are about to drop that
            // was NOT in the statement-start manifest is a rival's
            // committed write — dropping it is silent data loss
            val racing = dropped.filterNot(f => baseSet.contains(f.rel))
            if (racing.nonEmpty)
              throw new SnapshotLake.ConflictingRewriteException(newFiles,
                s"dynamic overwrite under $root would drop ${racing.size} " +
                  s"file(s) committed concurrently into overwritten " +
                  s"partition(s) (e.g. ${racing.head.rel})")
            newFiles ++ carried
          },
          lockExpiryMs = 10L * 60 * 1000)
      } catch {
        case e: SnapshotLake.ConflictingRewriteException =>
          // a SQL statement's committer cannot silently re-run the
          // query: clean the orphans and surface the statement contract
          e.staged.foreach { f =>
            fs.delete(new Path(root, s"data/${f.rel}"), false)
            f.bloomCols.foreach(c =>
              fs.delete(SnapshotLake.bloomPath(root, f.rel, c), false))
          }
          throw new IllegalStateException(
            s"INSERT OVERWRITE (dynamic) lost to a concurrent write into " +
              s"an overwritten partition — re-run the statement against " +
              s"the new head (${e.getMessage})")
      }
    } finally fs.delete(stageDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = stageDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(stageDir, true)
  }
}

object SnapshotDynamicOverwriteWrite {
  /** Test seam: runs after the frame is staged, immediately before the
    * manifest commit — the deterministic replay point for the
    * racing-append guard (a spec injects a concurrent append into a
    * touched partition here; production value is a no-op).
    */
  @volatile private[graft] var beforeCommit: () => Unit = () => ()
}

/** The executor-side hive-routing parquet writer every SQL write path
  * shares: routes each TABLE-SCHEMA row to its partition directory
  * (partition values rendered via Spark's own Cast-to-string in the
  * session time zone + hive escaping — byte-compatible with library
  * appends), strips the partition columns from the written file, opens
  * per-partition writers lazily, and reports (rel, bytes, rows) per
  * staged file at commit.
  */
private[sinks] final class HiveRoutingWriter(
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    stageDir: String,
    schema: StructType,
    partCols: Seq[String],
    timeZoneId: String,
    partitionId: Int,
    taskId: Long,
    namePrefix: String = "part",
    constraints: Seq[(String,
      org.apache.spark.sql.catalyst.expressions.Expression)] = Nil) {

  // declared table constraints, compiled ONCE per task to codegen'd
  // predicates over the full-schema row (violation conditions pre-bound
  // on the driver); a violating row fails the statement before its task
  // commits anything
  private val constraintPreds = constraints.map { case (n, e) =>
    (n, org.apache.spark.sql.catalyst.expressions.Predicate.create(e))
  }

  /** Loud ceiling on concurrently open per-partition files per task — a
    * rewrite routing into thousands of partitions from one task should
    * repartition by the partition columns, not OOM an executor.
    */
  private val MaxOpenWriters = 256

  private[sinks] val context = new TaskAttemptContextImpl(conf.value,
    new TaskAttemptID("graft", 0, TaskType.MAP, partitionId,
      (taskId % Int.MaxValue).toInt))
  private val ext = factory.getFileExtension(context)
  private val baseName = f"$namePrefix-$partitionId%05d-$taskId$ext"
  private val dataSchema = StructType(
    schema.fields.filterNot(f => partCols.contains(f.name)))
  private val dataIdx = schema.fields.zipWithIndex.collect {
    case (f, i) if !partCols.contains(f.name) => i
  }.toIndexedSeq
  private val partIdx = partCols.map(schema.fieldIndex)
  // hive-partition value rendering: Spark's own Cast-to-string in the
  // session time zone, escaped the way the library writer escapes
  private val partStrings = UnsafeProjection.create(partIdx.map(i =>
    Cast(BoundReference(i, schema(i).dataType, schema(i).nullable),
      StringType, Some(timeZoneId))
      : org.apache.spark.sql.catalyst.expressions.Expression).toIndexedSeq)
  private val dataProj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
    dataSchema, dataIdx)

  // dir-relative rel -> (writer, rows written)
  private val open = scala.collection.mutable.LinkedHashMap
    .empty[String, (org.apache.spark.sql.execution.datasources.OutputWriter, Long)]

  private def dirOf(row: InternalRow): String = {
    val strings = partStrings(row)
    partCols.indices.map { k =>
      require(!strings.isNullAt(k),
        s"row-level DML cannot route a NULL ${partCols(k)} partition " +
          "value — clean the frame or use the library merge")
      ExternalCatalogUtils.getPartitionPathString(partCols(k),
        strings.getUTF8String(k).toString)
    }.mkString("/")
  }

  /** Route one row in the FULL table schema. */
  def write(full: InternalRow): Unit = {
    constraintPreds.foreach { case (n, p) =>
      if (p.eval(full)) throw new IllegalArgumentException(
        s"write refused: constraint violation `$n` (declared via " +
          "constraint.<name> / notNullCols table properties; nothing " +
          "was committed)")
    }
    val rel =
      if (partCols.isEmpty) baseName
      else s"${dirOf(full)}/$baseName"
    val (writer, n) = open.getOrElseUpdate(rel, {
      require(open.size < MaxOpenWriters,
        s"row-level DML opened $MaxOpenWriters per-partition files " +
          "in one task — repartition the statement's input by " +
          s"(${partCols.mkString(", ")}) or use the library merge")
      (factory.newInstance(s"$stageDir/$rel", dataSchema, context), 0L)
    })
    if (partCols.isEmpty) writer.write(full)
    else {
      dataProj.project(full)
      writer.write(dataProj)
    }
    open.update(rel, (writer, n + 1))
  }

  def commitFiles(): Seq[StagedFileInfo] = {
    val fs = new Path(stageDir).getFileSystem(conf.value)
    open.toSeq.map { case (rel, (writer, rows)) =>
      writer.close()
      StagedFileInfo(rel,
        fs.getFileStatus(new Path(s"$stageDir/$rel")).getLen, rows)
    }
  }

  def abort(): Unit = {
    val fs = new Path(stageDir).getFileSystem(conf.value)
    open.foreach { case (rel, (writer, _)) =>
      try writer.close() catch { case _: Throwable => () }
      fs.delete(new Path(s"$stageDir/$rel"), false)
    }
  }
}

final class SnapshotDataWriterFactory(
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    stageDir: String,
    schema: StructType,
    partCols: Seq[String],
    timeZoneId: String,
    constraints: Seq[(String,
      org.apache.spark.sql.catalyst.expressions.Expression)] = Nil)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val routing = new HiveRoutingWriter(factory, conf, stageDir, schema,
      partCols, timeZoneId, partitionId, taskId,
      constraints = constraints)

    new DataWriter[InternalRow] {
      // ReplaceData's plan tags every row with a LEADING __row_operation
      // int; when the plan carries projections (it does whenever the
      // operation declares metadata attributes) Spark's writing task
      // applies the row projection and rows arrive in the plain table
      // schema — but with NO projections (e.g. a lake with a real
      // `_file` column, where metadata is off) the tag reaches us and is
      // stripped here, through Spark's own ProjectingInternalRow. Tag
      // values outside the group-based WRITE family mean the plan shape
      // changed under us: fail loudly rather than write rows under a
      // wrong layout.
      private val tagProj = org.apache.spark.sql.catalyst
        .ProjectingInternalRow(schema, (1 to schema.length).toIndexedSeq)
      private val writeOps = Set(
        org.apache.spark.sql.catalyst.util.RowDeltaUtils.WRITE_OPERATION,
        org.apache.spark.sql.catalyst.util.RowDeltaUtils
          .WRITE_WITH_METADATA_OPERATION)

      override def write(row: InternalRow): Unit = {
        val full: InternalRow =
          if (row.numFields == schema.length) row
          else {
            require(row.numFields == schema.length + 1,
              s"row-level write row has ${row.numFields} fields for a " +
                s"${schema.length}-column lake — plan layout drifted")
            val tag = row.getInt(0)
            require(writeOps.contains(tag),
              s"row-level write row tagged $tag — not a group-based " +
                "WRITE; plan layout drifted")
            tagProj.project(row)
            tagProj
          }
        routing.write(full)
      }

      override def commit(): WriterCommitMessage =
        StagedFilesMessage(routing.commitFiles())

      override def abort(): Unit = routing.abort()

      override def close(): Unit = ()
    }
  }
}
