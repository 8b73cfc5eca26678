package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextHash, TextNative, TopK}

/** Persisted inverted index for BM25 search — the [[VectorIndex]]
  * discipline applied to text: the lake layout IS the index.
  *
  * Layout under `path`:
  *   - `postings/` parquet partitioned by `bucket` =
  *     pmod(tokenHash(term), buckets): one row per (doc, term) with the
  *     term string, tf, and the doc length DENORMALIZED onto the posting
  *     (classic posting-list design — scoring never joins a doc table).
  *   - `stats/` one row: corpus size N and Σdl, the only global state
  *     BM25 needs.
  *
  * Query cost model (why this scales to 100 TB of documents):
  *   - a query's terms hash to ≤ |terms| buckets → the scan's partition
  *     filter prunes every other directory at the FILESYSTEM level
  *     (asserted via the scan's numFiles metric in TextIndexSpec);
  *   - df(term) is derivable from the PRUNED read (every posting of a
  *     term lives in its bucket), so no side lookup exists;
  *   - per-term tf columns come from one conditional aggregation per
  *     doc, the score is the SAME left-to-right fold as the batch scan
  *     ([[TextSearch.scoreExpr]] — shared code, bit-identical doubles),
  *     and ranking is the bounded-heap top-k. Nothing is globally
  *     sorted; nothing reads a bucket the query didn't touch.
  *
  * TextIndexSpec asserts index-served results are BIT-IDENTICAL to
  * [[TextSearch.bm25TopK]]'s one-shot scan on the same corpus.
  */
object TextIndex {

  /** Build (overwrite) the index: one tokenize pass, one (doc, term)
    * aggregation, one partitioned write + the one-row stats table.
    */
  def build(docs: DataFrame, text: Column, id: Column, path: String,
      buckets: Int = 64): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val toks = docs.select(id.as("doc_id"), TextNative.tokens(text).as("__tk"))
      .select(col("doc_id"), size(col("__tk")).as("dl"),
        explode(col("__tk")).as("term"))
    val postings = toks
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("int").as("tf"))
      .withColumn("bucket", pmod(TextHash.tokenHash(col("term")), lit(buckets.toLong)))
    postings
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "term", "doc_id")
      .write.mode("overwrite")
      .option("compression", "zstd")
      .partitionBy("bucket")
      .parquet(s"$path/postings")
    docs.select(id.as("doc_id"), TextNative.tokens(text).as("__tk"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("__tk")).cast("long")).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Append a batch of NEW documents (caller guarantees doc_ids disjoint
    * from the indexed corpus — ingest-time dedup is [[Dedup
    * .incrementalDropList]]'s job, upstream of indexing). Postings rows
    * append into their bucket partitions (no existing file is read or
    * rewritten); the one-row stats table is read (one collect of two
    * longs), summed, and overwritten. df(term) needs no maintenance — it
    * is derived from the postings at query time, so an append is visible
    * to the next query atomically with its partition commit.
    * TextIndexSpec asserts build(half)+append(half) == build(full)
    * bit-exactly.
    */
  def append(spark: SparkSession, newDocs: DataFrame, text: Column,
      id: Column, path: String, buckets: Int = 64): Unit = {
    val toks = newDocs.select(id.as("doc_id"), TextNative.tokens(text).as("__tk"))
      .select(col("doc_id"), size(col("__tk")).as("dl"),
        explode(col("__tk")).as("term"))
    toks
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("int").as("tf"))
      .withColumn("bucket", pmod(TextHash.tokenHash(col("term")), lit(buckets.toLong)))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "term", "doc_id")
      .write.mode("append")
      .option("compression", "zstd")
      .partitionBy("bucket")
      .parquet(s"$path/postings")
    // first streamed batch may land before any build(): absent stats = empty index
    val statsPath = new org.apache.hadoop.fs.Path(s"$path/stats")
    val fs = statsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old =
      if (fs.exists(statsPath)) spark.read.parquet(s"$path/stats").collect()(0)
      else org.apache.spark.sql.Row(0L, 0L)
    val delta = newDocs
      .select(id.as("doc_id"), TextNative.tokens(text).as("__tk"))
      .agg(count(lit(1)).as("n"), sum(size(col("__tk")).cast("long")).as("s"))
      .collect()(0)
    import spark.implicits._
    Seq((old.getLong(0) + delta.getLong(0), old.getLong(1) + delta.getLong(1)))
      .toDF("n_docs", "sum_dl")
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Top-k BM25 from the index: (rank, doc_id, score), identical to
    * [[TextSearch.bm25TopK]] on the indexed corpus.
    */
  def topK(spark: SparkSession, path: String, terms: Seq[String], k: Int,
      buckets: Int = 64, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val m = terms.size
    val qBuckets = terms.map(t =>
      java.lang.Long.remainderUnsigned(
        graft.functions.TextKernel.hash60(t), buckets.toLong)).distinct
    val pruned = spark.read.parquet(s"$path/postings")
      // partition-directory pruning: bucket is the partition column
      .filter(col("bucket").cast("long").isin(qBuckets: _*))
      .filter(col("term").isin(terms: _*))
    // per-doc term pivot: tf_i columns in TERM ORDER (missing term → 0,
    // which contributes exactly 0.0 like the batch scan's tf = 0)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("tf"))).as(s"__tf$i")
    }
    val perDoc = pruned.groupBy(col("doc_id"), col("dl"))
      .agg(tfCols.head, tfCols.tail: _*)
    // df per term from the pruned read (a term's postings all live here)
    val dfAggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"__df$i")
    }
    val dfs = pruned.agg(dfAggs.head, dfAggs.tail: _*)
    val stats = spark.read.parquet(s"$path/stats")
    val scored = perDoc
      .crossJoin(broadcast(dfs))
      .crossJoin(broadcast(stats))
    val score = TextSearch.scoreExpr(
      (0 until m).map(i => coalesce(col(s"__tf$i"), lit(0))),
      col("dl"), col("n_docs"), col("sum_dl"),
      (0 until m).map(i => col(s"__df$i")), k1, b)
    scored.select(col("doc_id"), score.as("score"))
      .filter(col("score") > 0.0)
      .agg(TopK.topK(col("score"), col("doc_id"), k).as("__top"))
      .select(posexplode(col("__top")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("doc_id"), col("col.score").as("score"))
  }
}
