package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Deduplication operators for training-data pipelines: exact content dedup,
  * MinHash signatures + LSH banding, SimHash, and token-set Jaccard.
  *
  * Scale design (100 TB):
  *   - Exact dedup is a hash-groupBy on a 256-bit content digest — one
  *     shuffle on the digest, no text comparison.
  *   - MinHash signatures are pure per-row expressions (array_min over a
  *     transform of the token set — no explode, no UDF, fully codegen).
  *     LSH banding turns the quadratic all-pairs problem into equi-joins on
  *     (band, bandKey): only documents agreeing on a full band meet, so the
  *     shuffle volume is O(n·bands) and candidate pairs are rare by design.
  *   - SimHash reduces each document to one 32-bit value; near-dup pairs are
  *     found by byte-banding (a Hamming-ball cover), again an equi-join.
  *   - All hashes derive from md5 via [[TextHash.tokenHash]], bit-identical
  *     in Spark and DuckDB, so every stage is oracle-checkable.
  */
object Dedup {

  val P: Long = 2147483647L // 2^31 − 1; keeps a*(h%P)+b well inside int64

  /** Deterministic universal-hash parameters (a_i, b_i) for MinHash —
    * plain LCG constants; generated once here and inlined as literals into
    * both the Spark expressions and the oracle SQL.
    */
  def hashParams(n: Int): Seq[(Long, Long)] =
    (0 until n).map { i =>
      val a = (1103515245L * (i + 1) + 12345L) % P
      val b = (1103515245L * (i + 101) + 54321L) % P
      (if (a == 0) 1L else a, b)
    }

  /** D1 — exact dedup groups: documents sharing a content digest; keeper is
    * the lowest id (deterministic). One shuffle on the digest.
    */
  def exactDedupGroups(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(sha2(text, 256).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(id).as("keep_id"))

  /** MinHash_i over a column of pre-reduced shingle hashes (h mod P):
    * min over shingles of (a_i·h + b_i) mod P. Null for empty docs.
    */
  def minhashCol(shingleHashes: Column, a: Long, b: Long): Column =
    array_min(transform(shingleHashes, h => (lit(a) * h + lit(b)) % lit(P)))

  /** D2 — MinHash signature over word `shingleN`-grams: id + n flat columns
    * mh00..mhNN (flat columns hash-compare and band more cheaply than
    * arrays). Pure per-row expressions — no explode, no shuffle.
    *
    * The token array and shingle set are materialized in their own
    * projections FIRST: inlining them into all n minhash lambdas makes
    * every `element_at` re-split the text (Catalyst does not CSE across
    * lambda boundaries — observed 80× slowdown). CollapseProject keeps
    * expensive multi-referenced aliases separate, so this stays two
    * pipelined map stages.
    */
  def minhashSignature(df: DataFrame, text: Column, id: Column,
      n: Int = 16, shingleN: Int = 3): DataFrame = {
    val toks = df.select(id.as("doc_id"), TextHash.tokens(text).as("__tk"))
    val shingled = toks.select(col("doc_id"),
      array_distinct(TextHash.wordNgrams(col("__tk"), shingleN)).as("__sh"))
    // md5 each shingle ONCE; the n affine maps then run over the longs
    val hashed = shingled.select(col("doc_id"),
      transform(col("__sh"), t => TextHash.tokenHash(t) % lit(P)).as("__hs"))
    val cols = hashParams(n).zipWithIndex.map { case ((a, b), i) =>
      minhashCol(col("__hs"), a, b).as(f"mh$i%02d")
    }
    hashed.select((col("doc_id") +: cols): _*)
  }

  /** D2b — LSH candidate pairs: band the signature (bands × rowsPerBand
    * must equal the signature width), join documents sharing any full band,
    * and report how many of the n minhashes agree (n_equal/n estimates
    * Jaccard). Equi-join on (band, bandKey) — no all-pairs blow-up.
    */
  def lshCandidatePairs(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val ks = (0 until rowsPerBand).map(r => col(f"mh${b * rowsPerBand + r}%02d"))
      struct(lit(b).as("band"), md5(concat_ws(",", ks: _*)).as("bkey"))
    }
    val exploded = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val pairs = exploded.as("x")
      .join(exploded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id1"), col("y.doc_id").as("doc_id2"))
      .distinct()
    val n = sig.columns.count(_.startsWith("mh"))
    val eq = (0 until n)
      .map(i => when(col(f"s1.mh$i%02d") === col(f"s2.mh$i%02d"), 1).otherwise(0))
      .reduce(_ + _)
    pairs
      .join(sig.as("s1"), col("doc_id1") === col("s1.doc_id"))
      .join(sig.as("s2"), col("doc_id2") === col("s2.doc_id"))
      .select(col("doc_id1"), col("doc_id2"), eq.as("n_equal"))
  }

  /** Resolve candidate pairs into a drop list: keep the lowest doc_id of
    * every near-dup pair, drop the other. Greedy per-pair (not connected
    * components — a drops-b, b-drops-c chain over-drops c; acceptable and
    * standard for near-dup pruning since over-dropping trades recall for
    * zero dup leakage). One distinct — no iteration, any scale.
    */
  def dropListFromPairs(pairs: DataFrame): DataFrame =
    pairs.select(col("doc_id2").as("drop_id")).distinct()

  /** Apply a drop list (anti-join — no payload from the drop side). */
  def pruneDuplicates(df: DataFrame, id: Column, dropList: DataFrame): DataFrame =
    df.join(dropList, id === col("drop_id"), "left_anti")

  /** D3 — 32-bit SimHash per document: each token occurrence votes ±1 on
    * every bit of its hash; bit b of the result is set when the vote sum is
    * positive. Explode(tokens) × 32 bits → two groupBys on doc_id — linear
    * in corpus size, shuffles on doc_id only.
    */
  def simhash32(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(id.as("doc_id"), explode(TextHash.tokens(text)).as("t"))
      .select(col("doc_id"), (TextHash.tokenHash(col("t")) % lit(P)).as("h"))
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(31))).as("b"))
      .groupBy("doc_id", "b")
      .agg(sum(when(expr("(shiftright(h, b) & 1)") === 1, 1L).otherwise(-1L)).as("s"))
      .groupBy("doc_id")
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)"))
        .otherwise(0L)).as("simhash"))

  /** D3b — near-dup pair histogram by Hamming distance: byte-band the
    * simhash (pairs within Hamming≤k of a 32-bit value must agree on at
    * least one of 4 bytes when k≤3 — with k=8 the bands are a recall-biased
    * candidate filter), equi-join per band, exact bit_count(xor) on the
    * candidates, aggregate pair counts per distance.
    */
  def simhashHammingHist(sh: DataFrame, maxDist: Int = 8): DataFrame = {
    val bytes = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("k"),
          expr(s"(shiftright(simhash, ${8 * k}) & 255)").as("byte"))): _*)).as("kb"))
      .select(col("doc_id"), col("simhash"),
        col("kb.k").as("k"), col("kb.byte").as("byte"))
    bytes.as("x").join(bytes.as("y"),
        col("x.k") === col("y.k") && col("x.byte") === col("y.byte") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id1"), col("y.doc_id").as("doc_id2"),
        col("x.simhash").as("s1"), col("y.simhash").as("s2"))
      .distinct()
      .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))))
      .filter(col("hamming") <= maxDist)
      .groupBy("hamming")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** D4 — token-set Jaccard similarity for all pairs within a blocking key
    * (e.g. source): explode distinct tokens, equi-join on (block, token) to
    * count intersections, derive |A∪B| from per-doc set sizes. The blocking
    * key bounds the quadratic term; at 100 TB the block is whatever
    * partition the candidate generator (LSH) produced.
    */
  def tokenJaccardPairs(df: DataFrame, text: Column, id: Column,
      block: Column, minJaccard: Double): DataFrame = {
    val toks = df.select(block.as("blk"), id.as("doc_id"),
      explode(TextHash.tokenSet(text)).as("t"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = toks.as("x").join(toks.as("y"),
        col("x.blk") === col("y.blk") && col("x.t") === col("y.t") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_id1"), col("y.doc_id").as("doc_id2"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.as("za"), col("doc_id1") === col("za.doc_id"))
      .join(sizes.as("zb"), col("doc_id2") === col("zb.doc_id"))
      .select(col("doc_id1"), col("doc_id2"), col("n_inter"),
        (col("za.sz") + col("zb.sz") - col("n_inter")).as("n_union"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / col("n_union").cast("double"))
      .filter(col("jaccard") >= minJaccard)
  }
}
