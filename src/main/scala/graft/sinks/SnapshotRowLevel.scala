package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** SQL `MERGE INTO` / `UPDATE` (and arbitrary-predicate `DELETE`) on
  * snapshot lakes: the GROUP-BASED copy-on-write seam of Spark's
  * row-level-operation framework (the one Iceberg's COW tables use),
  * on the graft manifest.
  *
  * How the pieces meet: the analyzer rewrites the DML into
  * `ReplaceData(query)` where `query` computes every SURVIVING row of
  * the groups the operation's scan read — matched rows modified per the
  * MERGE/UPDATE clauses, unmatched rows passed through — and the
  * operation's [[BatchWrite]] replaces those groups atomically. This
  * V1 keeps the group maximally simple and maximally safe: the group is
  * the WHOLE pinned snapshot (the scan is the full pinned manifest; no
  * runtime file filtering yet), so a SQL MERGE/UPDATE is a full
  * copy-on-write rewrite published as ONE commit — correct under the
  * same read-set-intact guard as every library rewrite, with concurrent
  * appends riding through untouched. Rewrites that should prune files
  * keep their fast paths: translatable `DELETE` predicates still take
  * the metadata path (Spark's own `OptimizeMetadataOnlyDeleteFromTable`
  * converts back to [[org.apache.spark.sql.connector.catalog.SupportsDelete]]
  * when it can), and keyed upserts at scale belong to
  * [[SnapshotLake.merge]] / [[SnapshotLake.mergeStream]], whose envelope
  * pruning no generic SQL MERGE can see.
  *
  * The write path is a REAL distributed DSv2 write (ReplaceData has no
  * V1 fallback): executors write zstd parquet through Spark's own
  * `ParquetFileFormat.prepareWrite` factory straight into the lake's
  * stage-dir convention, commit messages carry (file, bytes), and the
  * driver publishes through [[SnapshotLake.publishStaged]] + the lock
  * commit — footer stats and bloom sidecars restamped exactly like
  * every other rewrite, crash-safety by the same invisible-stage
  * contract. Unpartitioned lakes only in V1 (per-row hive routing
  * belongs to the library merge); refused loudly otherwise.
  */
final class SnapshotRowLevelOperation(
    spark: SparkSession,
    root: String,
    base: SnapshotLake.Manifest,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  require(base.files.forall(!_.rel.contains("=")) &&
    !base.props.contains("partitionCols"),
    s"SQL ${cmd} on a hive-partitioned snapshot lake is not supported — " +
      "use SnapshotLake.merge/delete (file-pruned, partition-aware)")

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String = s"graft-snapshot $cmd `$root`@v${base.version}"

  /** The operation scan: the full pinned manifest (the group being
    * replaced). Same vectorized path as any table read.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val index = new SnapshotPartitioningIndex(spark, root, base)
    ParquetScanBuilder(spark, index, base.schema, base.schema, options)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new SnapshotReplaceDataWrite(spark, root, base, info.schema,
            cmd.toString.toLowerCase)
      }
    }
}

final class SnapshotRowLevelOperationBuilder(
    spark: SparkSession, root: String, base: SnapshotLake.Manifest,
    info: RowLevelOperationInfo) extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation =
    new SnapshotRowLevelOperation(spark, root, base, info.command)
}

/** One staged parquet file an executor wrote: data/-relative name +
  * length (zero-row writers report `rows = 0` and are dropped at
  * commit, so a skewed empty partition never lands an empty file).
  */
private case class StagedFileMessage(rel: String, bytes: Long, rows: Long)
  extends WriterCommitMessage

/** The ReplaceData BatchWrite: replace the base manifest's whole file
  * list with the rewrite's output in ONE lock commit. Concurrent
  * appends ride through (they merge against versions after `base`);
  * a concurrent REWRITE fails the read-set guard and aborts this
  * statement loudly — a SQL statement cannot be silently re-run by the
  * committer, so the user re-issues it against the new head.
  */
final class SnapshotReplaceDataWrite(
    spark: SparkSession,
    root: String,
    base: SnapshotLake.Manifest,
    writeSchema: StructType,
    op: String) extends BatchWrite {

  // the framework must hand us rows in exactly the table's schema — a
  // Spark upgrade that adds projection columns would otherwise land
  // files whose physical schema drifts from the manifest's, silently
  require(writeSchema.fields.map(f => (f.name, f.dataType)).sameElements(
    base.schema.fields.map(f => (f.name, f.dataType))),
    s"row-level write schema ${writeSchema.simpleString} != lake schema " +
      s"${base.schema.simpleString}")

  private val token = java.util.UUID.randomUUID.toString.replace("-", "").take(16)
  private val stageDir = new Path(root, s".stage-$token")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val fs = stageDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(stageDir)
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    val factory = new ParquetFileFormat().prepareWrite(spark, job,
      Map("compression" -> "zstd"), writeSchema)
    new SnapshotDataWriterFactory(factory,
      new SerializableConfiguration(job.getConfiguration),
      stageDir.toString, writeSchema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = stageDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      val staged = messages.collect {
        case m: StagedFileMessage if m.rows > 0 =>
          (new Path(stageDir, m.rel), s"$token-${m.rel}", m.bytes)
      }.toSeq
      val statsCols = base.files.flatMap(_.stats.keys).toSet
      val bloomCols = base.files.flatMap(_.bloomCols).distinct
      val newFiles = SnapshotLake.publishStaged(spark, root, staged,
        statsCols, bloomCols)
      val baseSet = base.files.map(_.rel).toSet
      try {
        SnapshotLake.commit(spark, root, s"$op:sql", base.schema,
          build = head => newFiles ++
            SnapshotLake.requireReadSetIntact(baseSet, head, newFiles,
              s"$op:sql", root)
              .filterNot(f => baseSet.contains(f.rel)),
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
            s"SQL $op lost to a concurrent rewrite of the same lake — " +
              s"re-run the statement against the new head (${e.getMessage})")
      }
    } finally fs.delete(stageDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = stageDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(stageDir, true)
  }
}

final class SnapshotDataWriterFactory(
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    stageDir: String,
    schema: StructType) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val context = new TaskAttemptContextImpl(conf.value,
      new TaskAttemptID("graft", 0, TaskType.MAP, partitionId,
        (taskId % Int.MaxValue).toInt))
    val ext = factory.getFileExtension(context)
    val rel = f"part-$partitionId%05d-$taskId$ext"
    val path = s"$stageDir/$rel"
    val writer = factory.newInstance(path, schema, context)
    new DataWriter[InternalRow] {
      private var rows = 0L
      // ReplaceData's plan tags every row with a LEADING __row_operation
      // int, and with no declared metadata attributes Spark's plain
      // writing task applies NO projection (ReplaceDataExec.writingTask
      // drops the row projection unless a metadata projection exists) —
      // so the tag is stripped here, through Spark's own
      // ProjectingInternalRow. Tag values outside the group-based WRITE
      // family mean the plan shape changed under us: fail loudly rather
      // than write rows under a wrong layout.
      private val dataProj = org.apache.spark.sql.catalyst
        .ProjectingInternalRow(schema,
          (1 to schema.length).toIndexedSeq)
      private val writeOps = Set(
        org.apache.spark.sql.catalyst.util.RowDeltaUtils.WRITE_OPERATION,
        org.apache.spark.sql.catalyst.util.RowDeltaUtils
          .WRITE_WITH_METADATA_OPERATION)
      override def write(row: InternalRow): Unit =
        if (row.numFields == schema.length) { // already projected
          writer.write(row); rows += 1
        } else {
          require(row.numFields == schema.length + 1,
            s"row-level write row has ${row.numFields} fields for a " +
              s"${schema.length}-column lake — plan layout drifted")
          val op = row.getInt(0)
          require(writeOps.contains(op),
            s"row-level write row tagged $op — not a group-based WRITE; " +
              "plan layout drifted")
          dataProj.project(row)
          writer.write(dataProj)
          rows += 1
        }
      override def commit(): WriterCommitMessage = {
        writer.close()
        val p = new Path(path)
        val fs = p.getFileSystem(conf.value)
        StagedFileMessage(rel, fs.getFileStatus(p).getLen, rows)
      }
      override def abort(): Unit = {
        try writer.close() catch { case _: Throwable => () }
        val p = new Path(path)
        p.getFileSystem(conf.value).delete(p, false)
      }
      override def close(): Unit = ()
    }
  }
}
