package graft.sinks

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, NamespaceChange, ProcedureCatalog, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The snapshot lake as a CATALOG plugin — the Delta/Iceberg catalog
  * pattern on the graft manifest: one warehouse directory, every table a
  * snapshot lake under `<warehouse>/<namespace...>/<table>`, and the
  * whole SQL table lifecycle with NO path options anywhere:
  *
  * {{{
  *   spark.sql.catalog.graft = graft.sinks.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /data/lakes
  *
  *   CREATE NAMESPACE graft.prod
  *   CREATE TABLE graft.prod.bars (symbol STRING, ts TIMESTAMP_NTZ,
  *     close DOUBLE) PARTITIONED BY (symbol)        -- empty v1 manifest
  *   CREATE TABLE graft.prod.top AS SELECT ...      -- CTAS
  *   INSERT INTO graft.prod.bars SELECT ...         -- manifest commit
  *   SELECT * FROM graft.prod.bars VERSION AS OF 3  -- SQL time travel
  *   SELECT * FROM graft.prod.bars TIMESTAMP AS OF '2026-08-16 12:00:00'
  *   ALTER TABLE graft.prod.bars ADD COLUMNS (venue STRING)
  *     -- metadata-only evolve commit: no byte of data rewritten
  *   ALTER TABLE graft.prod.bars RENAME TO graft.prod.bars_v2
  *   DROP TABLE graft.prod.bars                     -- managed: data gone
  * }}}
  *
  * Catalog state IS the filesystem — a namespace is a directory, a table
  * is a directory holding `_manifests/` — so there is no second metastore
  * to drift from the lakes (`listTables` = one directory listing;
  * concurrent writers coordinate through each lake's own commit
  * protocol, not through this class). `VERSION AS OF` resolves through
  * the pinned-manifest read ([[SnapshotTable]]); `TIMESTAMP AS OF`
  * resolves via [[SnapshotLake.versionAt]] (manifest publish mtime —
  * document-grade; pin a VERSION for bit-exact replays). DROP deletes
  * the lake directory (managed-table semantics — every table lives
  * under the warehouse this catalog owns); RENAME is a directory move,
  * refused onto an existing target.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: Path = _

  private def spark: SparkSession = SparkSession.active
  private def fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = new Path(Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.warehouse=<dir>")))
  }

  override def name(): String = catalogName

  private def nsPath(namespace: Array[String]): Path =
    namespace.foldLeft(warehouse)(new Path(_, _))

  private def rootOf(ident: Identifier): Path =
    new Path(nsPath(ident.namespace), ident.name)

  /** Lake root for a table identifier — the procedure seam. */
  private[sinks] def rootFor(ident: Identifier): String =
    rootOf(ident).toString

  // ------------------------------------------------------------ procedures

  /** `CALL graft.system.<verb>(...)` — SQL table maintenance
    * ([[GraftProcedures]]): optimize / zorder / add_stats / vacuum /
    * restore, each ONE library call with the library's lock semantics.
    */
  override def loadProcedure(ident: Identifier): UnboundProcedure =
    GraftProcedures.load(this, ident)

  /** The verbs live ONLY in the `system` namespace — listing any other
    * namespace must not advertise them as living there (SHOW PROCEDURES
    * against `graft.prod` would otherwise print phantom entries).
    * An empty namespace lists the whole catalog's procedures.
    */
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      GraftProcedures.names.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  private def isLake(p: Path): Boolean =
    fs.exists(new Path(p, "_manifests"))

  // ---------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsPath(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(name() +: namespace)
    fs.listStatus(dir).filter(s => s.isDirectory && isLake(s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean = isLake(rootOf(ident))

  private def table(ident: Identifier, version: Option[Long]): SnapshotTable = {
    val root = rootOf(ident)
    if (!isLake(root))
      throw new NoSuchTableException(name() +: ident.namespace :+ ident.name)
    new SnapshotTable(spark, root.toString, version, None, Nil,
      new CaseInsensitiveStringMap(
        java.util.Collections.singletonMap("path", root.toString)),
      catalogManaged = true)
  }

  override def loadTable(ident: Identifier): Table = table(ident, None)

  /** SQL `VERSION AS OF <v>`. */
  override def loadTable(ident: Identifier, version: String): Table =
    table(ident, Some(version.toLong))

  /** SQL `TIMESTAMP AS OF <ts>` (micros since epoch). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootOf(ident)
    if (!isLake(root))
      throw new NoSuchTableException(name() +: ident.namespace :+ ident.name)
    val v = SnapshotLake.versionAt(spark, root.toString, timestamp).getOrElse(
      throw new IllegalArgumentException(
        s"no snapshot of ${ident} existed at timestamp $timestamp μs — " +
          "the first commit is later (or the version was vacuumed)"))
    table(ident, Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    if (tableExists(ident))
      throw new TableAlreadyExistsException(
        name() +: ident.namespace :+ ident.name)
    val partCols = partitions.toSeq.map { t =>
      require(t.name == "identity",
        s"graft catalog supports identity partitioning only, got $t")
      t.references()(0).fieldNames().mkString(".")
    }
    // `statsCols`/`bloomCols` from OPTIONS (landed under "option.") or
    // TBLPROPERTIES persist into the manifest props, so the lake's FIRST
    // insert already maintains the data-skipping index — without this,
    // writeShape's head-file inheritance sees an empty create commit and
    // the index silently never materializes (round-12 defect 2)
    val declared = properties.asScala
    val indexProps = Seq("statsCols", "bloomCols").flatMap { k =>
      declared.get(k).orElse(declared.get(s"option.$k")).map(k -> _)
    }.toMap
    indexProps.foreach { case (k, v) =>
      v.split(',').map(_.trim).filter(_.nonEmpty).foreach(c =>
        require(schema.fieldNames.contains(c),
          s"$k column $c not in schema ${schema.simpleString}"))
    }
    // `dmlMode = 'mor'` opts the lake into merge-on-read row-level DML
    // (position-delete sidecars); default is copy-on-write
    val dmlMode = declared.get("dmlMode").orElse(declared.get("option.dmlMode"))
    dmlMode.foreach(v => require(v == "cow" || v == "mor",
      s"dmlMode must be 'cow' or 'mor', got '$v'"))
    // write constraints: `constraint.<name>` = SQL CHECK expression,
    // `notNullCols` = CSV of NOT NULL columns — enforced by every write
    // path at commit time (a violating statement refuses, nothing lands)
    val constraintProps = declared.toMap.collect {
      case (k, v) if k.startsWith("constraint.") => k -> v
      case (k, v) if k.startsWith("option.constraint.") =>
        k.stripPrefix("option.") -> v
    } ++ declared.get("notNullCols").orElse(declared.get("option.notNullCols"))
      .map("notNullCols" -> _)
    constraintProps.get("notNullCols").foreach(
      _.split(',').map(_.trim).filter(_.nonEmpty).foreach(c =>
        require(schema.fieldNames.contains(c),
          s"notNullCols column $c not in schema ${schema.simpleString}")))
    // a malformed CHECK expression must refuse at CREATE, not at the
    // first write: compile each against the declared schema now
    if (constraintProps.exists(_._1.startsWith("constraint.")))
      SnapshotLake.boundConstraints(spark, schema,
        constraintProps.filter(_._1.startsWith("constraint.")))
    SnapshotLake.create(spark, rootOf(ident).toString, schema, partCols,
      tableProps = indexProps ++ dmlMode.map("dmlMode" -> _) ++
        constraintProps)
    table(ident, None)
  }

  /** `ALTER TABLE ADD COLUMNS` lands as ONE metadata-only `evolve`
    * commit (widening contract: old files read the new columns as
    * NULL); `RENAME COLUMN` / `DROP COLUMN` land as metadata-only
    * field-id commits ([[SnapshotLake.renameColumn]] /
    * [[SnapshotLake.dropColumn]] — id-resolved, so old files read
    * correctly and dropped data never resurrects). Retypes and
    * properties are refused loudly: narrowing is an explicit migration,
    * not an ALTER.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    require(changes.nonEmpty, "ALTER TABLE: nothing to change")
    val root = rootOf(ident).toString
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    val drops = changes.collect { case d: TableChange.DeleteColumn => d }
    val retypes = changes.collect { case t: TableChange.UpdateColumnType => t }
    require(adds.size + renames.size + drops.size + retypes.size ==
      changes.size,
      s"graft catalog supports ALTER TABLE ADD/RENAME/DROP COLUMN and " +
        s"widening ALTER COLUMN TYPE only; got " +
        changes.filterNot(c => c.isInstanceOf[TableChange.AddColumn]
          || c.isInstanceOf[TableChange.RenameColumn]
          || c.isInstanceOf[TableChange.DeleteColumn]
          || c.isInstanceOf[TableChange.UpdateColumnType]).mkString(", "))
    require(Seq(adds, renames, drops, retypes).count(_.nonEmpty) == 1,
      "ALTER TABLE: one change kind per statement")
    if (retypes.nonEmpty) {
      retypes.foreach { t =>
        require(t.fieldNames.length == 1,
          s"ALTER COLUMN TYPE supports top-level columns only, got " +
            t.fieldNames.mkString("."))
        SnapshotLake.widenColumn(spark, root, t.fieldNames.head, t.newDataType)
      }
    } else if (renames.nonEmpty) {
      renames.foreach { r =>
        require(r.fieldNames.length == 1,
          s"RENAME COLUMN supports top-level columns only, got " +
            r.fieldNames.mkString("."))
        SnapshotLake.renameColumn(spark, root, r.fieldNames.head, r.newName)
      }
    } else if (drops.nonEmpty) {
      drops.foreach { d =>
        require(d.fieldNames.length == 1,
          s"DROP COLUMN supports top-level columns only, got " +
            d.fieldNames.mkString("."))
        SnapshotLake.dropColumn(spark, root, d.fieldNames.head)
      }
    } else {
      adds.foreach { a =>
        require(a.fieldNames.length == 1,
          s"ADD COLUMNS supports top-level columns only, got " +
            a.fieldNames.mkString("."))
        require(a.isNullable,
          s"added column ${a.fieldNames.head} must be nullable: existing " +
            "rows read it as NULL")
        // the evolve commit always APPENDS; a positioned add (FIRST /
        // AFTER x) landing at the end would silently disobey the user
        require(a.position() == null,
          s"added column ${a.fieldNames.head} specifies a position " +
            "(FIRST/AFTER) — graft ADD COLUMNS appends at the end only")
      }
      SnapshotLake.addColumns(spark, root,
        StructType(adds.map(a =>
          org.apache.spark.sql.types.StructField(a.fieldNames.head,
            a.dataType, nullable = true))))
    }
    table(ident, None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dropped = isLake(rootOf(ident)) && fs.delete(rootOf(ident), true)
    // DROP then re-CREATE at the same path in one long-lived driver must
    // not serve the dropped lake's parsed manifests to pinned/time-travel
    // reads (the exact hazard invalidateManifestCache documents)
    if (dropped) SnapshotLake.invalidateManifestCache(rootOf(ident).toString)
    dropped
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent))
      throw new NoSuchTableException(
        name() +: oldIdent.namespace :+ oldIdent.name)
    if (tableExists(newIdent))
      throw new TableAlreadyExistsException(
        name() +: newIdent.namespace :+ newIdent.name)
    // same-store directory move; the manifest's relative layout makes
    // the lake location-independent, so the rename is metadata-complete
    val target = rootOf(newIdent)
    fs.mkdirs(target.getParent)
    require(fs.rename(rootOf(oldIdent), target),
      s"rename failed: ${rootOf(oldIdent)} -> $target")
    SnapshotLake.invalidateManifestCache(rootOf(oldIdent).toString)
    // the target path may carry stale entries from a previously dropped
    // lake that lived there before this JVM renamed one onto it
    SnapshotLake.invalidateManifestCache(target.toString)
  }

  // ------------------------------------------------------------ namespaces

  override def listNamespaces(): Array[Array[String]] =
    if (!fs.exists(warehouse)) Array.empty
    else fs.listStatus(warehouse)
      .filter(s => s.isDirectory && !isLake(s.getPath))
      .map(s => Array(s.getPath.getName))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      val dir = nsPath(namespace)
      if (!fs.exists(dir)) throw new NoSuchNamespaceException(name() +: namespace)
      fs.listStatus(dir).filter(s => s.isDirectory && !isLake(s.getPath))
        .map(s => namespace :+ s.getPath.getName)
    }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || (fs.exists(nsPath(namespace)) && !isLake(nsPath(namespace)))

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(name() +: namespace)
    Map("location" -> nsPath(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new NamespaceAlreadyExistsException(name() +: namespace)
    fs.mkdirs(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val dir = nsPath(namespace)
    if (!cascade && fs.listStatus(dir).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty — DROP ... CASCADE")
    fs.delete(dir, true)
  }
}
