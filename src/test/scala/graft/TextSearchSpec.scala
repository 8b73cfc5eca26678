package graft

import org.apache.spark.sql.functions._

import graft.operators.TextSearch

/** BM25 semantics + plan-shape tests (the oracle pins the arithmetic
  * bit-exactly on the corpus; these prove ranking BEHAVIOR on planted
  * fixtures and that the plan keeps the bounded-heap shape).
  */
class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark engine with columnar scans and hash joins"),
    (2L, "spark spark spark spark everywhere in this spark doc"),
    (3L, "nothing relevant here at all just filler words"),
    (4L, "a very long document about many things including spark once " +
      ("padding words repeated endlessly " * 10)),
    (5L, "spark engine with columnar scans and hash joins") // tie with 1
  ).toDF("doc_id", "text")

  test("bm25: term-stuffed doc ranks above single mention; misses excluded") {
    val r = TextSearch.bm25TopK(docs, col("text"), col("doc_id"),
      Seq("spark"), 10).collect()
    assert(r.map(_.getLong(1)).toSeq.head == 2L) // highest tf wins
    assert(!r.map(_.getLong(1)).contains(3L))    // no-match doc excluded
    // short doc with one mention beats the long padded doc (length norm)
    val ranks = r.map(x => x.getLong(1) -> x.getLong(0)).toMap
    assert(ranks(1L) < ranks(4L))
    // exact-duplicate docs tie; lower id first
    assert(ranks(1L) + 1 == ranks(5L))
    val scores = r.map(_.getDouble(2))
    assert(scores.sorted.reverse.toSeq == scores.toSeq) // best-first
  }

  test("bm25: multi-term scores are the sum of per-term relevance") {
    val single = TextSearch.bm25TopK(docs, col("text"), col("doc_id"),
      Seq("columnar"), 10).collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val multi = TextSearch.bm25TopK(docs, col("text"), col("doc_id"),
      Seq("columnar", "zzz_absent"), 10).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // an absent term contributes 0 to every matching doc
    assert(single.keySet == multi.keySet)
    single.foreach { case (id, s) => assert(math.abs(multi(id) - s) < 1e-12) }
  }

  test("bm25 plan: bounded-heap aggregate, no global sort of scored rows") {
    val plan = TextSearch.bm25TopK(docs, col("text"), col("doc_id"),
      Seq("spark"), 5).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected heap aggregate in plan:\n$plan")
    assert(!plan.contains("SortExec"), s"unexpected global sort:\n$plan")
  }
}
