package graft.sinks

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection, Expression => CatalystExpression}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

/** SQL scan for a lake whose files span GENERATIONS — field-id
  * generations (a [[SnapshotLake.upgradeFieldIds]] migration leaves
  * pre-migration [[SnapshotLake.FileEntry.idless]] files that read by
  * the name-mapped schema) and/or partition-layout generations (a
  * [[SnapshotLake.repartitionSpec]] evolution leaves files whose rel
  * paths dir-encode DIFFERENT column sets — mixed dirs would fail
  * Spark's partition inference outright). One stock vectorized parquet
  * scan is planned PER GENERATION, each with its own partitioning index
  * (its dirs supply its own layout's values; everything else reads from
  * data), its own read schema (idless files under old names, ids
  * stripped, so the reader matches by name), and the pushed filters it
  * can soundly take (renamed-column filters are dropped on legacy
  * sides; Spark re-applies every data filter above the scan, so pruning
  * changes which row groups open, never the answer). The partitions
  * concatenate into ONE `BatchScan`; because different generations emit
  * different physical column orders (a parquet scan outputs data
  * columns then partition columns), each generation's readers are
  * wrapped with a zero-copy column PERMUTATION onto the canonical
  * output order — identity (and skipped) when the orders already agree,
  * which is every pre-evolution lake. Iceberg reads migrated tables
  * through exactly this name-mapping + spec-evolution fallback.
  *
  * A full `compact()` rewrites every file under the current ids and
  * layout and retires this scan — the plain single-scan path resumes.
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

  /** One file generation: same id-resolution mode AND same dir layout. */
  private case class Gen(files: Seq[SnapshotLake.FileEntry],
      legacy: Boolean, layout: Seq[String]) {
    def schema: StructType = if (legacy) mappedSchema else base.schema
  }

  private val gens: Seq[Gen] = base.files
    .groupBy(f => (f.idless, SnapshotLake.layoutOf(f.rel))).toSeq
    .sortBy { case ((l, lay), _) => (l, lay.mkString("/")) }
    .map { case ((idless, lay), fs) => Gen(fs, idless, lay) }

  private def buildInner(g: Gen): Scan = {
    val index = new SnapshotPartitioningIndex(spark, root,
      base.copy(files = g.files, schema = g.schema))
    val dataSchema = StructType(
      g.schema.fields.filterNot(f => g.layout.contains(f.name)))
    val sb = ParquetScanBuilder(spark, index, g.schema, dataSchema, options)
    sb.pushFilters(
      // only filters untouched by renames are sound against old names
      if (g.legacy)
        pushedExprs.filter(_.references.forall(a => !nameMap.contains(a.name)))
      else pushedExprs)
    required.map(r => if (g.legacy) mapRequired(r) else r)
      .foreach(sb.pruneColumns)
    sb.build()
  }

  private val inners: Seq[(Gen, Scan)] = gens.map(g => g -> buildInner(g))

  /** A generation's scan output under CURRENT names (legacy fields
    * renamed back through the migration mapping).
    */
  private def currentNames(s: StructType, legacy: Boolean): StructType =
    if (!legacy) s
    else {
      val back = mappedSchema.fields.zip(base.schema.fields)
        .map { case (o, c) => o.name -> c.name }.toMap
      StructType(s.fields.map(f =>
        f.copy(name = back.getOrElse(f.name, f.name))))
    }

  /** Canonical output = the FIRST generation's physical order (identity
    * for that generation, so the single-generation case — every
    * pre-evolution lake — is wrapper-free); every generation serves the
    * same column SET (parquet scans prune to the required columns,
    * partition or data alike), so the others permute onto it.
    */
  override def readSchema(): StructType =
    currentNames(inners.head._2.readSchema(), inners.head._1.legacy)

  override def toBatch: Batch = this

  override def description(): String =
    s"graft-split-scan `$root`@v${base.version}: " +
      gens.map(g => s"${g.files.size} file(s) " +
        s"[${if (g.legacy) "name-mapped" else "id"}|" +
        s"${if (g.layout.isEmpty) "flat" else g.layout.mkString("/")}]")
        .mkString(" + ")

  override def planInputPartitions(): Array[InputPartition] =
    inners.zipWithIndex.flatMap { case ((_, s), i) =>
      s.toBatch.planInputPartitions().map(SplitInputPartition(_, i))
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val out = readSchema()
    val perGen = inners.map { case (g, s) =>
      val mine = currentNames(s.readSchema(), g.legacy)
      require(mine.fieldNames.sorted.sameElements(out.fieldNames.sorted),
        s"split-scan generation column sets diverged: ${mine.simpleString}" +
          s" vs ${out.simpleString}")
      val perm = out.fieldNames.map(n => mine.fieldIndex(n))
      SplitGenReaders(s.toBatch.createReaderFactory(), perm,
        mine.fields.map(_.dataType))
    }
    new SplitReaderFactory(perGen)
  }
}

private final case class SplitInputPartition(inner: InputPartition,
    gen: Int) extends InputPartition {
  override def preferredLocations(): Array[String] =
    inner.preferredLocations()
}

/** One generation's reader factory + the permutation from ITS physical
  * column order onto the scan's canonical output order (`perm(i)` = the
  * generation-local index serving canonical column i; `dataTypes` are
  * generation-local, indexed by ITS order).
  */
private final case class SplitGenReaders(
    factory: PartitionReaderFactory,
    perm: Array[Int],
    dataTypes: Array[DataType]) {
  def identity: Boolean = perm.zipWithIndex.forall { case (p, i) => p == i }
}

private final class SplitReaderFactory(gens: Seq[SplitGenReaders])
    extends PartitionReaderFactory {

  private def pick(p: InputPartition): (SplitGenReaders, InputPartition) = {
    val sp = p.asInstanceOf[SplitInputPartition]
    (gens(sp.gen), sp.inner)
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val (g, ip) = pick(p)
    val r = g.factory.createReader(ip)
    if (g.identity) r
    else new PartitionReader[InternalRow] {
      // executor-side, built lazily: project the generation's row order
      // onto the canonical one (types are generation-local, permuted)
      private val proj = UnsafeProjection.create(
        g.perm.map(i => BoundReference(i, g.dataTypes(i), nullable = true)
          : CatalystExpression))
      override def next(): Boolean = r.next()
      override def get(): InternalRow = proj(r.get())
      override def close(): Unit = r.close()
    }
  }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    val (g, ip) = pick(p)
    val r = g.factory.createColumnarReader(ip)
    if (g.identity) r
    else new PartitionReader[ColumnarBatch] {
      // zero-copy: re-order the batch's column VECTORS; the inner
      // reader keeps ownership (and close()) of the vectors themselves
      override def next(): Boolean = r.next()
      override def get(): ColumnarBatch = {
        val b = r.get()
        val cols = new Array[ColumnVector](g.perm.length)
        var i = 0
        while (i < g.perm.length) { cols(i) = b.column(g.perm(i)); i += 1 }
        new ColumnarBatch(cols, b.numRows())
      }
      override def close(): Unit = r.close()
    }
  }

  override def supportColumnarReads(p: InputPartition): Boolean = {
    val (g, ip) = pick(p)
    g.factory.supportColumnarReads(ip)
  }
}
