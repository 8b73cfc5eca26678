package graft.sinks

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DateType, StructType, TimestampNTZType, TimestampType}

/** TRANSPARENT manifest-stats file skipping for [[SnapshotLake]] reads:
  * a Catalyst `FileIndex` whose `listFiles` prunes the snapshot's file
  * list against the manifest's per-file min/max envelopes using the
  * query's OWN pushed-down data filters — so an ordinary
  * `readPruned(...).filter($"ts" >= X)` opens only the overlapping
  * files, with no `readBox` call and no stats job. This is the same
  * integration seam Delta/Iceberg use (their log-backed FileIndex
  * implementations plug into exactly this trait), rebuilt over the
  * graft manifest.
  *
  * Planning cost at 100 TB: ONE manifest read on the driver, zero
  * directory listings, zero parquet footer probes; the scan's task set
  * is the pruned file list. Filter translation is CONSERVATIVE — only
  * envelope-expressible shapes prune (>=, >, <=, <, =, IN, BETWEEN via
  * AND, on columns with recorded stats); anything else simply keeps the
  * file, never drops it (pruning must be sound, not complete). The
  * residual predicate still runs row-level inside the scan, so pruning
  * can only change WHICH files are opened, never the answer —
  * SnapshotLakeSpec asserts row identity against the unpruned read.
  */
final class ManifestFileIndex(
    spark: SparkSession,
    dataDir: Path,
    val entries: Seq[SnapshotLake.FileEntry],
    dataSchema: StructType) extends FileIndex {

  private val statuses: Seq[(SnapshotLake.FileEntry, FileStatus)] =
    entries.map { e =>
      (e, new FileStatus(e.bytes, false, 1, 128L * 1024 * 1024, 0L,
        new Path(dataDir, e.rel)))
    }

  /** DELIBERATELY two paths. `rootPaths` feeds exactly one write-side
    * consumer: `InsertIntoHadoopFsRelationCommand`, which refuses any
    * relation whose location has ≠ 1 root path BEFORE planning the
    * write — stopping SQL `INSERT INTO` / `INSERT OVERWRITE` from
    * landing (or, for static overwrite, DELETING) parquet files
    * directly under data/, bypassing the manifest commit protocol and
    * corrupting the lake. Since round 12 this guard is
    * DEFENSE-IN-DEPTH, not the doorway's contract: SQL INSERT resolves
    * through the DSv2 [[SnapshotTable]] (whose V1Write lands it as a
    * manifest commit), and this V1 relation is reachable only via
    * [[readPruned]] or `spark.sql.sources.useV1SourceList` — where an
    * INSERT must still refuse. Read-side consumers of rootPaths are
    * cosmetic (plan Location strings); file listing goes through
    * [[listFiles]]/[[inputFiles]], which are unaffected.
    */
  override def rootPaths: Seq[Path] = Seq(dataDir, new Path(dataDir, "_manifest_guard"))

  override def partitionSchema: StructType = StructType(Nil)

  override def sizeInBytes: Long = entries.map(_.bytes).sum

  override def inputFiles: Array[String] =
    statuses.map(_._2.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val box = ManifestFileIndex.boxOf(dataFilters)
    val kept = statuses.filter { case (e, _) =>
      ManifestFileIndex.surviving(e.stats, box)
    }
    Seq(PartitionDirectory(InternalRow.empty,
      kept.map(s => FileStatusWithMetadata(s._2, Map.empty))))
  }
}

object ManifestFileIndex {

  /** The intersected per-column [lo, hi] box a conjunction of pushed-down
    * data filters implies — the shared pruning predicate of this V1 index
    * and the DSv2 [[SnapshotPartitioningIndex]].
    */
  private[sinks] def boxOf(dataFilters: Seq[Expression]): Map[String, (Double, Double)] =
    dataFilters.foldLeft(Map.empty[String, (Double, Double)]) { (acc, f) =>
      intersect(acc, bounds(f))
    }

  /** Does a file with these envelopes survive the box? Sound, not
    * complete: a column with no recorded envelope keeps the file.
    */
  private[sinks] def surviving(stats: Map[String, (Double, Double)],
      box: Map[String, (Double, Double)]): Boolean =
    box.forall { case (c, (lo, hi)) =>
      stats.get(c).forall { case (fLo, fHi) => fHi >= lo && fLo <= hi }
    }

  private def intersect(a: Map[String, (Double, Double)],
      b: Map[String, (Double, Double)]): Map[String, (Double, Double)] =
    (a.keySet ++ b.keySet).map { k =>
      (a.get(k), b.get(k)) match {
        case (Some((l1, h1)), Some((l2, h2))) =>
          k -> (math.max(l1, l2), math.min(h1, h2))
        case (Some(v), None) => k -> v
        case (None, v) => k -> v.get
      }
    }.toMap

  /** The [lo, hi] interval a predicate implies per column, in the footer
    * stats domain (timestamps already arrive as micros literals from
    * Catalyst; dates as epoch days). Conservative: unrecognized shapes
    * contribute no constraint.
    */
  private[sinks] def bounds(e: Expression): Map[String, (Double, Double)] = {
    def lit(l: Literal): Option[Double] = l.dataType match {
      case TimestampType | TimestampNTZType | DateType =>
        Option(l.value).map(v => v.asInstanceOf[Number].doubleValue)
      case _ => Option(l.value).collect { case n: Number => n.doubleValue }
    }
    e match {
      case And(l, r) =>
        val (bl, br) = (bounds(l), bounds(r))
        (bl.keySet ++ br.keySet).map { k =>
          (bl.get(k), br.get(k)) match {
            case (Some((l1, h1)), Some((l2, h2))) =>
              k -> (math.max(l1, l2), math.min(h1, h2))
            case (Some(v), None) => k -> v
            case (None, v) => k -> v.get
          }
        }.toMap
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        lit(l).map(v => Map(a.name -> (v, Double.PositiveInfinity))).getOrElse(Map.empty)
      case GreaterThan(a: AttributeReference, l: Literal) =>
        lit(l).map(v => Map(a.name -> (v, Double.PositiveInfinity))).getOrElse(Map.empty)
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        lit(l).map(v => Map(a.name -> (Double.NegativeInfinity, v))).getOrElse(Map.empty)
      case LessThan(a: AttributeReference, l: Literal) =>
        lit(l).map(v => Map(a.name -> (Double.NegativeInfinity, v))).getOrElse(Map.empty)
      case EqualTo(a: AttributeReference, l: Literal) =>
        lit(l).map(v => Map(a.name -> (v, v))).getOrElse(Map.empty)
      // mirrored operand order: lit OP attr flips the bound direction
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        lit(l).map(v => Map(a.name -> (Double.NegativeInfinity, v))).getOrElse(Map.empty)
      case GreaterThan(l: Literal, a: AttributeReference) =>
        lit(l).map(v => Map(a.name -> (Double.NegativeInfinity, v))).getOrElse(Map.empty)
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        lit(l).map(v => Map(a.name -> (v, Double.PositiveInfinity))).getOrElse(Map.empty)
      case LessThan(l: Literal, a: AttributeReference) =>
        lit(l).map(v => Map(a.name -> (v, Double.PositiveInfinity))).getOrElse(Map.empty)
      case EqualTo(l: Literal, a: AttributeReference) =>
        lit(l).map(v => Map(a.name -> (v, v))).getOrElse(Map.empty)
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        val ds = vs.flatMap(v => lit(v.asInstanceOf[Literal]))
        if (ds.isEmpty) Map.empty else Map(a.name -> (ds.min, ds.max))
      case _ => Map.empty
    }
  }

  /** The auto-pruning relation over a snapshot version (latest when
    * None) — the seam both [[readPruned]] and the registered
    * `graft-snapshot` batch format ([[graft.streaming
    * .SnapshotSourceProvider]]) plan through: a `HadoopFsRelation` whose
    * FileIndex is the manifest, so pushed-down filters prune files at
    * planning time and the scan itself is Spark's own vectorized
    * parquet reader inside whole-stage codegen. Unpartitioned lakes
    * only — hive partition values live in paths, not files, so a
    * partitioned snapshot must use `SnapshotLake.read`/`readBox` (whose
    * explicit-schema path resolves them); with stats-pruning on the
    * partition-deriving columns there is nothing a directory layout
    * would add.
    */
  def relation(spark: SparkSession, root: String,
      version: Option[Long] = None): HadoopFsRelation = {
    val m = SnapshotLake.manifest(spark, root, version)
    require(m.files.forall(!_.rel.contains("=")),
      "the pruned snapshot relation supports unpartitioned snapshot " +
        "lakes; this lake has hive partition dirs — use " +
        "SnapshotLake.read/readBox")
    // a bare HadoopFsRelation cannot anti-join position deletes into its
    // own scan; serving it would RESURRECT rows a merge-on-read DML
    // removed — refuse loudly (the V2 table scan and every library read
    // apply them; one compact() absorbs them and restores this path)
    require(m.files.forall(_.deletes.isEmpty),
      "the V1 snapshot relation cannot apply merge-on-read position " +
        "deletes; read through SnapshotLake.read / the V2 table, or " +
        "compact() to absorb the deletes")
    // ditto pre-migration (id-less) files: a bare relation reads ONE
    // schema, and these files need the name-mapped one
    require(m.files.forall(!_.idless),
      "the V1 snapshot relation cannot name-map pre-migration files; " +
        "read through SnapshotLake.read / the V2 table, or compact() " +
        "to materialize field ids")
    require(m.files.iterator.map(f =>
        SnapshotLake.layoutOf(f.rel)).toSet.size <= 1,
      "the V1 snapshot relation cannot span partition-layout " +
        "generations; read through SnapshotLake.read / the V2 table, " +
        "or compact() to migrate files to the current spec")
    SnapshotLake.requireFieldIdReads(spark, m)
    val dd = new Path(root, "data")
    val index = new ManifestFileIndex(spark, dd, m.files, m.schema)
    HadoopFsRelation(index, StructType(Nil), m.schema, None,
      new ParquetFileFormat, Map.empty[String, String])(spark)
  }

  /** An auto-pruning DataFrame over a snapshot version (latest when
    * None): filters you write prune files through the manifest stats at
    * planning time. See [[relation]] for the contract.
    */
  def readPruned(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame =
    spark.baseRelationToDataFrame(relation(spark, root, version))
}
