package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextIndex, TextSearch}

/** Persisted inverted-index BM25: bit-identity with the batch scan and
  * filesystem-level bucket pruning.
  */
class TextIndexSpec extends SparkSpec {

  private def docs = graft.sources.Tables.documents(spark, sfDir)

  test("index-served top-k is bit-identical to the one-shot batch scan") {
    val dir = java.nio.file.Files.createTempDirectory("textidx").toString
    TextIndex.build(docs, col("text"), col("doc_id"), dir, buckets = 16)
    for (terms <- Seq(Seq("vector"), Seq("vector", "join", "spark"))) {
      val idx = TextIndex.topK(spark, dir, terms, 20, buckets = 16)
        .collect().map(_.toString).sorted
      val batch = TextSearch.bm25TopK(docs, col("text"), col("doc_id"), terms, 20)
        .collect().map(_.toString).sorted
      assert(idx.sameElements(batch), s"index != batch for terms=$terms")
    }
  }

  test("build(half) + append(half) equals build(full) bit-exactly") {
    val dirA = java.nio.file.Files.createTempDirectory("textidx").toString
    val dirB = java.nio.file.Files.createTempDirectory("textidx").toString
    val (lo, hi) = (docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    TextIndex.build(docs, col("text"), col("doc_id"), dirA, buckets = 16)
    TextIndex.build(lo, col("text"), col("doc_id"), dirB, buckets = 16)
    TextIndex.append(spark, hi, col("text"), col("doc_id"), dirB, buckets = 16)
    val full = TextIndex.topK(spark, dirA, Seq("vector", "spark"), 20, buckets = 16)
      .collect().map(_.toString).sorted
    val inc = TextIndex.topK(spark, dirB, Seq("vector", "spark"), 20, buckets = 16)
      .collect().map(_.toString).sorted
    assert(inc.sameElements(full))
  }

  test("absent terms: empty result, no crash; mixed present/absent still exact") {
    val dir = java.nio.file.Files.createTempDirectory("textidx").toString
    TextIndex.build(docs, col("text"), col("doc_id"), dir, buckets = 16)
    assert(TextIndex.topK(spark, dir, Seq("zzz_not_in_corpus"), 5,
      buckets = 16).count() == 0)
    val idx = TextIndex.topK(spark, dir, Seq("vector", "zzz_not_in_corpus"), 10,
      buckets = 16).collect().map(_.toString).sorted
    val batch = TextSearch.bm25TopK(docs, col("text"), col("doc_id"),
      Seq("vector", "zzz_not_in_corpus"), 10).collect().map(_.toString).sorted
    assert(idx.sameElements(batch))
  }

  test("query reads only the buckets its terms hash to") {
    val dir = java.nio.file.Files.createTempDirectory("textidx").toString
    TextIndex.build(docs, col("text"), col("doc_id"), dir, buckets = 16)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.sum
    }
    val full = filesRead(spark.read.parquet(s"$dir/postings"))
    val one = filesRead(TextIndex.topK(spark, dir, Seq("vector"), 5, buckets = 16))
    // small corpus: ~30-word vocabulary leaves some of the 16 buckets
    // empty, so the full listing is < 16 files
    assert(full >= 8, s"expected most bucket files present, got $full")
    // one term -> one bucket; the query plan reads it twice (tf pivot +
    // df aggregate), still far under the full listing
    assert(one <= full / 4, s"expected bucket pruning, read $one of $full")
  }
}
