package graft.sinks

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression => CatalystExpression}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

/** SQL scan for a field-id-MIGRATED lake that still holds pre-migration
  * files ([[SnapshotLake.FileEntry.idless]]): two stock vectorized
  * parquet scans planned side by side — id-carrying files read with the
  * current (id-stamped) schema, id-less files with the migration's
  * [[SnapshotLake.nameMappedSchema]] (old names, ids stripped, so
  * Spark's reader matches by name; renamed columns resolve to what the
  * old files actually call them, post-migration additions read NULL).
  * The two read schemas are positionally and type-identical, so the
  * partitions simply concatenate — one `BatchScan`, both sides
  * vectorized, filters and column pruning forwarded to the id side in
  * full and to the legacy side for columns whose NAME is unchanged
  * (renamed-column filters are dropped there; Spark re-applies every
  * data filter above the scan, so pruning changes which row groups
  * open, never the answer). Iceberg reads migrated tables through
  * exactly this name-mapping fallback.
  *
  * A full `compact()` rewrites every file with ids and retires this
  * scan — the plain single-scan path resumes.
  */
final class SnapshotSplitScanBuilder(
    spark: SparkSession,
    root: String,
    base: SnapshotLake.Manifest,
    partCols: Seq[String],
    options: CaseInsensitiveStringMap) extends ScanBuilder
    with SupportsPushDownCatalystFilters with SupportsPushDownRequiredColumns {

  private var pushedExprs: Seq[CatalystExpression] = Nil
  private var required: Option[StructType] = None

  override def pushFilters(filters: Seq[CatalystExpression]): Seq[CatalystExpression] = {
    pushedExprs = filters
    filters // ALL residual: the engine re-applies every predicate
  }

  override def pushedFilters: Array[V2Predicate] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  override def build(): Scan = {
    SnapshotLake.requireFieldIdReads(spark, base)
    new SnapshotSplitScan(spark, root, base, required, pushedExprs,
      partCols, options)
  }
}

final class SnapshotSplitScan(
    spark: SparkSession,
    root: String,
    base: SnapshotLake.Manifest,
    required: Option[StructType],
    pushedExprs: Seq[CatalystExpression],
    partCols: Seq[String],
    options: CaseInsensitiveStringMap) extends Scan with Batch {

  private val (idlessFiles, idfulFiles) = base.files.partition(_.idless)
  private val mappedSchema: StructType = SnapshotLake.nameMappedSchema(base)

  /** current name → name-at-migration, for fields a RENAME moved. */
  private val nameMap: Map[String, String] =
    base.schema.fields.zip(mappedSchema.fields).collect {
      case (c, o) if c.name != o.name => c.name -> o.name
    }.toMap

  private def mapRequired(r: StructType): StructType =
    StructType(r.fields.map { f =>
      base.schema.fields.indexWhere(_.name == f.name) match {
        case -1 => f // `_file` / other non-data columns: name unchanged
        case i => mappedSchema(i).copy(nullable = f.nullable)
      }
    })

  private def buildInner(files: Seq[SnapshotLake.FileEntry],
      schema: StructType, req: Option[StructType],
      filters: Seq[CatalystExpression]): Scan = {
    val index = new SnapshotPartitioningIndex(spark, root,
      base.copy(files = files, schema = schema))
    val dataSchema = StructType(
      schema.fields.filterNot(f => partCols.contains(f.name)))
    val sb = ParquetScanBuilder(spark, index, schema, dataSchema, options)
    sb.pushFilters(filters)
    req.foreach(sb.pruneColumns)
    sb.build()
  }

  private val innerCurrent: Option[Scan] =
    if (idfulFiles.isEmpty) None
    else Some(buildInner(idfulFiles, base.schema, required, pushedExprs))

  private val innerLegacy: Option[Scan] =
    if (idlessFiles.isEmpty) None
    else Some(buildInner(idlessFiles, mappedSchema,
      required.map(mapRequired),
      // only filters untouched by renames are sound against old names
      pushedExprs.filter(_.references.forall(a => !nameMap.contains(a.name)))))

  /** Output schema under CURRENT names. Both inners emit the same
    * positional layout (the legacy one under old names), so when only
    * legacy files exist the schema is its read schema renamed back.
    */
  override def readSchema(): StructType = innerCurrent match {
    case Some(s) => s.readSchema()
    case None =>
      val back = mappedSchema.fields.zip(base.schema.fields)
        .map { case (o, c) => o.name -> c.name }.toMap
      StructType(innerLegacy.get.readSchema().fields.map(f =>
        f.copy(name = back.getOrElse(f.name, f.name))))
  }

  override def toBatch: Batch = this

  override def description(): String =
    s"graft-split-scan `$root`@v${base.version} ${idfulFiles.size} " +
      s"id-carrying + ${idlessFiles.size} name-mapped pre-migration files"

  override def planInputPartitions(): Array[InputPartition] =
    innerCurrent.toArray.flatMap(_.toBatch.planInputPartitions()
      .map(SplitInputPartition(_, legacy = false))) ++
      innerLegacy.toArray.flatMap(_.toBatch.planInputPartitions()
        .map(SplitInputPartition(_, legacy = true)))

  override def createReaderFactory(): PartitionReaderFactory =
    new SplitReaderFactory(
      innerCurrent.map(_.toBatch.createReaderFactory()),
      innerLegacy.map(_.toBatch.createReaderFactory()))
}

private final case class SplitInputPartition(inner: InputPartition,
    legacy: Boolean) extends InputPartition {
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

private final class SplitReaderFactory(
    current: Option[PartitionReaderFactory],
    legacy: Option[PartitionReaderFactory]) extends PartitionReaderFactory {

  private def pick(p: InputPartition): (PartitionReaderFactory, InputPartition) = {
    val sp = p.asInstanceOf[SplitInputPartition]
    ((if (sp.legacy) legacy else current).get, sp.inner)
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val (f, ip) = pick(p); f.createReader(ip)
  }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    val (f, ip) = pick(p); f.createColumnarReader(ip)
  }

  override def supportColumnarReads(p: InputPartition): Boolean = {
    val (f, ip) = pick(p); f.supportColumnarReads(ip)
  }
}
