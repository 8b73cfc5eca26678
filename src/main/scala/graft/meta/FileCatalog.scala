package graft.meta

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.{JsonMethods, Serialization}

/** File-side metadata catalog (reference
  * enhanced_metadata_manager.py:85-138): one JSON document per dataset
  * under `<dir>/`, plus an `index.json` mapping "symbol_interval" keys to
  * quick-search entries, rebuildable from the per-dataset files.
  *
  * Complements [[Meta]] (the DB/DataFrame side): this is the catalog a
  * plain file lake carries with it. All IO goes through the Hadoop
  * FileSystem API, so `dir` may be local, HDFS, or object storage —
  * catalogs are dimension-sized (one small JSON per dataset), driver-side
  * by design.
  */
object FileCatalog {

  private implicit val fmts: Formats = DefaultFormats

  /** index.json entry (the reference's quick-search projection,
    * enhanced_metadata_manager.py:125-131).
    */
  case class IndexEntry(file: String, symbol: String, interval: String,
      rows: Long)

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readString(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def writeString(f: FileSystem, p: Path, s: String): Unit = {
    val out = f.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  def key(m: Meta.DatasetMeta): String = s"${m.symbol}_${m.interval}"

  private def docPath(dir: String, m: Meta.DatasetMeta): Path =
    new Path(dir, s"${key(m)}.json")

  /** Save one dataset's metadata document and update index.json in place.
    * Returns the key it is indexed under.
    */
  def save(spark: SparkSession, dir: String, m: Meta.DatasetMeta): String = {
    val f = fs(spark, dir)
    f.mkdirs(new Path(dir))
    writeString(f, docPath(dir, m), Serialization.writePretty(m))
    val idx = index(spark, dir) +
      (key(m) -> IndexEntry(s"${key(m)}.json", m.symbol, m.interval, m.rows))
    writeString(f, new Path(dir, "index.json"), Serialization.writePretty(idx))
    key(m)
  }

  /** Load a dataset's full metadata by index key ("symbol_interval"). */
  def load(spark: SparkSession, dir: String, k: String): Option[Meta.DatasetMeta] = {
    val f = fs(spark, dir)
    val p = new Path(dir, s"$k.json")
    if (!f.exists(p)) None
    else Some(JsonMethods.parse(readString(f, p)).extract[Meta.DatasetMeta])
  }

  /** Current index (empty when absent — call [[rebuildIndex]] to recover
    * from a lost or stale index.json).
    */
  def index(spark: SparkSession, dir: String): Map[String, IndexEntry] = {
    val f = fs(spark, dir)
    val p = new Path(dir, "index.json")
    if (!f.exists(p)) Map.empty
    else JsonMethods.parse(readString(f, p)).extract[Map[String, IndexEntry]]
  }

  /** Rebuild index.json by re-reading every per-dataset document
    * (enhanced_metadata_manager.py:109-138) — the recovery path when the
    * index is lost; per-dataset files remain the source of truth.
    */
  def rebuildIndex(spark: SparkSession, dir: String): Map[String, IndexEntry] = {
    val f = fs(spark, dir)
    val root = new Path(dir)
    if (!f.exists(root)) return Map.empty
    val entries = f.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".json") &&
        s.getPath.getName != "index.json")
      .flatMap { s =>
        scala.util.Try {
          val m = JsonMethods.parse(readString(f, s.getPath)).extract[Meta.DatasetMeta]
          key(m) -> IndexEntry(s.getPath.getName, m.symbol, m.interval, m.rows)
        }.toOption // unreadable docs are skipped, as the reference does
      }.toMap
    writeString(f, new Path(dir, "index.json"), Serialization.writePretty(entries))
    entries
  }

  /** Search the index by symbol and/or interval (the reference's
    * find_datasets quick path — index-only, no document reads).
    */
  def search(spark: SparkSession, dir: String, symbol: Option[String] = None,
      interval: Option[String] = None): Seq[IndexEntry] =
    index(spark, dir).values.toSeq
      .filter(e => symbol.forall(_ == e.symbol))
      .filter(e => interval.forall(_ == e.interval))
      .sortBy(e => (e.symbol, e.interval))
}
