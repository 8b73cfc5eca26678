package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{JavaMath, TextNative, TopK}

/** BM25 full-text relevance scoring over the document corpus — the classic
  * lexical ranking function (Robertson/Spärck Jones; the scoring behind
  * Lucene/Elasticsearch defaults), as a batch operator: score every
  * document against a bag of query terms and keep the top k.
  *
  * Scale shape (100 TB):
  *   - ONE corpus pass computes per-doc (dl, tf…) via the native
  *     [[graft.functions.TermFreqs]] kernel (no explode — the corpus never
  *     inflates to (doc, token) rows).
  *   - corpus statistics (N, Σdl, df per term) are ONE aggregate row,
  *     broadcast back via a cross join — no driver-side collect in the
  *     plan, no second scan shape that a literal-stats formulation would
  *     need.
  *   - ranking is the bounded-heap [[graft.functions.TopKByScore]]
  *     aggregate: map-side partials, `partitions × k` entries cross the
  *     wire, nothing is globally sorted (the 100 TB form of ORDER BY
  *     score LIMIT k).
  *   - only documents matching ≥ 1 term reach the ranking (score > 0
  *     filter) — miss rows never leave their partition.
  *   For interactive many-query workloads, build an inverted index the
  *   same way [[VectorIndex]] persists IVF lists; this operator is the
  *   one-shot batch-scoring / reranking shape.
  *
  * Bit-exactness: idf uses [[graft.functions.JavaLog]] (libm `ln`,
  * identical in DuckDB) and the per-term contributions fold left-to-right
  * in term order, so the oracle replays every double op in sequence.
  */
object TextSearch {

  /** Top-k BM25: (rank, doc_id, score), rank 1 = best, ties broken by
    * lowest doc_id (identical to `row_number() ORDER BY score DESC,
    * doc_id`).
    *
    * @param k1 term-frequency saturation (standard 1.2)
    * @param b  length normalization (standard 0.75)
    */
  def bm25TopK(docs: DataFrame, text: Column, id: Column,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    // dedupe at the entry point (first occurrence keeps its slot) so this
    // path, TermFreqs' slot map, and TextIndex's pivot share one
    // contract: a term contributes once (ADVICE r6 — the kernel's
    // term→slot map and the index pivot diverged on duplicate terms)
    val dterms = terms.distinct
    val m = dterms.size
    val base = docs.select(id.as("doc_id"),
      TextNative.termFreqs(text, dterms).as("__f"))
    val perDoc = base.select(col("doc_id"),
      col("__f").getField("dl").as("__dl"),
      col("__f").getField("tf").as("__tf"))
    // one corpus-stats row: N, Σdl, df per term (docs containing the term)
    val statAggs =
      Seq(count(lit(1)).as("__n"),
        sum(col("__dl").cast("long")).as("__sumdl")) ++
        (0 until m).map(i =>
          sum(when(element_at(col("__tf"), i + 1) > 0, 1L).otherwise(0L))
            .as(s"__df$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val scored = perDoc.crossJoin(broadcast(stats))
    val score = scoreExpr(
      (0 until m).map(i => element_at(col("__tf"), i + 1)),
      col("__dl"), col("__n"), col("__sumdl"),
      (0 until m).map(i => col(s"__df$i")), k1, b)
    scored.select(col("doc_id"), score.as("score"))
      .filter(col("score") > 0.0)
      .agg(TopK.topK(col("score"), col("doc_id"), k).as("__top"))
      .select(posexplode(col("__top")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("doc_id"), col("col.score").as("score"))
  }

  /** The BM25 score fold, shared verbatim by the batch scan and the
    * persisted [[TextIndex]] so both paths produce bit-identical doubles:
    * contributions in TERM ORDER, reduced left-to-right.
    */
  private[operators] def scoreExpr(tfs: Seq[Column], dl: Column,
      n: Column, sumdl: Column, dfs: Seq[Column],
      k1: Double, b: Double): Column =
    tfs.zip(dfs)
      .map { case (tfc, dfc) => contribExpr(tfc, dl, n, sumdl, dfc, k1, b) }
      .reduceLeft(_ + _)

  /** One term's BM25 contribution — the unit [[scoreExpr]] folds and the
    * join-shaped [[TextIndex.topKBatch]] sums per matched (query, doc)
    * row; kept as ONE function so every path computes the identical
    * double-op sequence.
    */
  private[operators] def contribExpr(tfc: Column, dl: Column,
      n: Column, sumdl: Column, dfc: Column,
      k1: Double, b: Double): Column = {
    val avgdl = sumdl.cast("double") / n.cast("double")
    val dlNorm = lit(k1) * (lit(1.0) - lit(b) + lit(b) * (dl.cast("double") / avgdl))
    val tf = tfc.cast("double")
    val df = dfc.cast("double")
    val idf = JavaMath.jlog(lit(1.0) +
      ((n.cast("double") - df) + lit(0.5)) / (df + lit(0.5)))
    // k1 + 1 as a RUNTIME addition of the two literals (constant-folded
    // with IEEE semantics) so the SQL mirror `(1.2 + 1.0)` is the same
    // double — a pre-added Scala literal need not equal the SQL parse
    idf * ((tf * (lit(k1) + lit(1.0))) / (tf + dlNorm))
  }
}
