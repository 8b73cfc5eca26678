package graft.meta

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset metadata, validation reports, and lineage (SURVEY §1.2 — the
  * reference's `enhanced_metadata_manager.py` JSON catalog +
  * `metadata_db.py` JSONB tables).
  *
  * The reference keeps metadata as one JSON file per dataset plus four
  * Postgres JSONB tables; here metadata is just another DataFrame —
  * `extra` ships as a MapType column serialized with to_json/from_json at
  * the storage edge, lineage is a plain edge table, and every §2.4
  * metadata query (A6/A7/A12) composes on top.
  */
object Meta {

  case class DatasetMeta(
      dataset_id: Long,
      name: String,
      symbol: String,
      interval: String,
      provider: String,
      rows: Long,
      sha256: String,
      quality_score: Double,
      extra: Map[String, String])

  /** Lineage edge: `target` was derived from `source` via `operation`
    * (reference data_lineage, metadata_db.py:118-131).
    */
  case class LineageEdge(source_dataset_id: Long, target_dataset_id: Long,
      operation: String)

  def metaDs(spark: SparkSession, rows: Seq[DatasetMeta]): Dataset[DatasetMeta] = {
    import spark.implicits._
    spark.createDataset(rows)
  }

  /** JSON catalog export: one JSON document per dataset, `extra` inlined —
    * the file-side format (enhanced_metadata_manager.py:85-138).
    */
  def toJsonCatalog(meta: Dataset[DatasetMeta]): DataFrame =
    meta.toDF().select(col("dataset_id"), to_json(struct(col("*"))).as("doc"))

  /** Parse a JSON catalog back into typed rows. */
  def fromJsonCatalog(spark: SparkSession, docs: DataFrame): Dataset[DatasetMeta] = {
    val schema = Encoders.product[DatasetMeta].schema
    docs.select(from_json(col("doc"), schema).as("m")).select("m.*")
      .as(Encoders.product[DatasetMeta])
  }

  /** 1-hop lineage join (the only lineage traversal the reference does,
    * metadata_db.py:437-461): each edge decorated with source/target names.
    * Broadcast both sides — metadata is always dimension-sized.
    */
  def lineage1Hop(edges: Dataset[LineageEdge], meta: Dataset[DatasetMeta]): DataFrame = {
    val m = broadcast(meta.toDF().select(col("dataset_id"), col("name")))
    edges.toDF()
      .join(m.as("src"), col("source_dataset_id") === col("src.dataset_id"))
      .join(m.as("tgt"), col("target_dataset_id") === col("tgt.dataset_id"))
      .select(
        col("source_dataset_id"), col("src.name").as("source_name"),
        col("target_dataset_id"), col("tgt.name").as("target_name"),
        col("operation"))
  }

  /** Catalog summary (A12 shape on the metadata table itself:
    * enhanced_metadata_manager.py:338-365).
    */
  def summary(meta: Dataset[DatasetMeta]): DataFrame =
    meta.toDF().agg(
      countDistinct(col("symbol")).as("n_symbols"),
      countDistinct(col("interval")).as("n_intervals"),
      countDistinct(col("provider")).as("n_providers"),
      sum(col("rows")).as("total_rows"),
      count(lit(1)).as("n_datasets"))
}
