package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{OracleSql => O}
import graft.sources.Tables

/** Declared-query catalog for the dedup operators ([[Dedup]]) on the
  * `documents` table: exact hash dedup, MinHash signatures + LSH pairs,
  * SimHash + Hamming histogram, token-set Jaccard on LSH candidates.
  *
  * The signature queries (d2, d3) are the strong oracle checks — every
  * md5-derived hash in the pipeline must agree bit-for-bit across engines.
  * The pair queries then exercise the join/banding machinery. This corpus
  * has no true near-duplicates at 3-gram granularity (d2b is legitimately
  * sparse); the planted-duplicate unit tests in DedupSpec prove detection.
  */
object DedupQueries {

  private val nHashes = 16
  private val bands = 4
  private val rows = 4

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_exact_dedup" -> ((s, dir) =>
      Dedup.exactDedupGroups(Tables.documents(s, dir), col("text"), col("doc_id"))),
    "d2_minhash_sig" -> ((s, dir) =>
      Dedup.minhashSignature(Tables.documents(s, dir), col("text"), col("doc_id"),
        nHashes, shingleN = 3)),
    "d2b_lsh_pairs" -> ((s, dir) =>
      Dedup.lshCandidatePairs(
        Dedup.minhashSignature(Tables.documents(s, dir), col("text"), col("doc_id"),
          nHashes, shingleN = 3),
        bands, rows)
        .withColumn("n_equal", col("n_equal").cast("long"))),
    "d3_simhash" -> ((s, dir) =>
      Dedup.simhash(Tables.documents(s, dir), col("text"), col("doc_id"))),
    "d3b_hamming_hist" -> ((s, dir) =>
      Dedup.simhashHammingHist(
        Dedup.simhash(Tables.documents(s, dir), col("text"), col("doc_id")),
        maxDist = 8)
        .withColumn("hamming", col("hamming").cast("long"))),
    // D4 at scale: collapse to token-set classes, LSH + exact Jaccard at
    // class level, expand to doc pairs — no block-quadratic term (the old
    // `source`-blocked variant remains in the library as the
    // exact-within-block API; jaccardOnCandidates as the general form).
    "d4_token_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairsAtScale(Tables.documents(s, dir),
        col("text"), col("doc_id"), 0.8, nHashes, bands, rows)),
    // D4 on a REALISTIC-selectivity fixture (VERDICT r6): duplication
    // clusters with a diverse, cluster-prefixed vocabulary — banding
    // prunes all cross-cluster pairs, so this measures the banding win
    // (the `documents` fixture above is the documented low-entropy worst
    // case, output-bound by design). Runs through the GUARDED entry
    // point: the admission check measures selectivity and passes here.
    "d4b_jaccard_clustered" -> ((s, dir) =>
      Dedup.jaccardPairsAtScaleGuarded(
        clusteredCorpus(Tables.documents(s, dir)),
        col("text"), col("doc_id"), 0.8, nHashes, bands, rows)),
    // D4c — the near-dup CENSUS (VERDICT r8 #3): d4's similarity histogram
    // with pair counts carried as class-pair WEIGHTS — the 281 M-pair sf10
    // output that made d4 output-bound (306.7 s) never exists; candidates
    // stay class-level and the result is ~5 rows at any corpus size.
    "d4c_jaccard_census" -> ((s, dir) =>
      Dedup.jaccardCensusAtScale(Tables.documents(s, dir),
        col("text"), col("doc_id"), 0.8, nHashes, bands, rows)),
    // D6 at scale: signature-class collapse — the drop list is derived
    // from class adjacency + neighborhood minima, never doc pairs.
    "d6_drop_list" -> ((s, dir) =>
      Dedup.dropListAtScale(
        Dedup.minhashSignature(Tables.documents(s, dir), col("text"), col("doc_id"),
          nHashes, shingleN = 3),
        bands, rows, minAgree = 8)),
    // D8 (beyond-reference) — duplicated-span census: word 8-gram spans
    // occurring in >= 2 distinct docs, the discovery pass of
    // substring-level dedup (boilerplate shared across distinct pages).
    "d8_span_census" -> ((s, dir) =>
      Dedup.spanCensus(Tables.documents(s, dir), col("text"), col("doc_id"),
        n = 8, minDocs = 2)),
    // D9 (beyond-reference) — incremental ingest dedup: the % 5 == 0
    // residue class plays the NEW batch, the rest the already-landed
    // corpus signature store; new docs near-duplicating the corpus are
    // dropped without any corpus-vs-corpus banding.
    "d9_incremental_drop" -> ((s, dir) => {
      val sig = Dedup.minhashSignature(Tables.documents(s, dir),
        col("text"), col("doc_id"), nHashes, shingleN = 3)
      Dedup.incrementalDropList(
        sig.filter(col("doc_id") % 5 === 0),
        sig.filter(col("doc_id") % 5 =!= 0),
        bands, rows, minAgree = 8)
    }),
    // D10 (beyond-reference) — connected components over the near-dup
    // pair graph (alternating large-star/small-star): every doc in the
    // clustered fixture labeled with its dup-cluster's minimum id. The
    // oracle computes the same labels as a recursive-CTE min-reachability
    // closure over the identical pair relation — a hash match proves the
    // O(log n)-round distributed algorithm reaches the exact equivalence
    // closure a transitive-closure engine computes.
    "d10_dup_components" -> ((s, dir) => {
      val pairs = Dedup.jaccardPairsAtScaleGuarded(
        clusteredCorpus(Tables.documents(s, dir)),
        col("text"), col("doc_id"), 0.8, nHashes, bands, rows)
      Dedup.connectedComponents(pairs, col("doc_id1"), col("doc_id2"))
        .select(col("id").as("doc_id"), col("comp"))
    }),
    // DC1 (beyond-reference) — benchmark decontamination: training docs
    // (doc_id % 97 != 0) sharing any word 3-gram with the benchmark
    // residue class (doc_id % 97 = 0). Broadcast bench grams; only
    // matches reach the per-doc count exchange.
    "dc1_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Contamination.overlapReport(
        docs.filter(col("doc_id") % 97 =!= 0), col("text"), col("doc_id"),
        Contamination.benchmarkGrams(
          docs.filter(col("doc_id") % 97 === 0), col("text"), n = 3),
        n = 3)
    })
  )

  /** d4b's derived corpus: duplication clusters of FIXED SIZE ~11 keyed
    * by doc_id / 11 (integer division — cluster COUNT grows with the
    * corpus, cluster size does not, so near-dup pair output stays LINEAR
    * in corpus size; the first cut keyed doc_id % 97, whose fixed cluster
    * count made within-cluster pairs quadratic in sf — ~1.3e9 pairs at
    * sf10). Each doc = the cluster's 40 cluster-prefixed tokens with ONE
    * slot (doc_id % 40) replaced by a doc-unique token — within a cluster
    * Jaccard is ≥ 39/41 ≈ 0.95 (true near-dups), across clusters the
    * vocabularies are disjoint (Jaccard 0). Deterministic from doc_id
    * only, so the DuckDB mirror derives the identical corpus.
    */
  private def clusteredCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      array_join(transform(sequence(lit(0), lit(39)), k =>
        when(k === col("doc_id") % 40,
          concat(lit("u"), col("doc_id").cast("string")))
          .otherwise(concat(lit("c"), floor(col("doc_id") / 11).cast("string"),
            lit("w"), k.cast("string")))), " ").as("text"))

  private val clusteredCorpusSql =
    """corpus2 AS (
      |  SELECT doc_id,
      |         array_to_string(list_transform(generate_series(0, 39), k ->
      |           CASE WHEN k = doc_id % 40 THEN 'u' || CAST(doc_id AS VARCHAR)
      |                ELSE 'c' || CAST(doc_id // 11 AS VARCHAR) || 'w' || CAST(k AS VARCHAR) END), ' ')
      |         AS text
      |  FROM documents
      |)""".stripMargin

  // ------------------------------------------------------------------
  // DuckDB mirrors

  /** Word 3-gram shingle set of the token list `tk` (empty when <3 tokens,
    * matching TextHash.wordNgrams' guard).
    */
  private val shingleSetSql =
    """list_distinct(CASE WHEN len(tk) >= 3
      |  THEN list_transform(generate_series(1, len(tk) - 2),
      |         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
      |  ELSE [] END)""".stripMargin

  private def minhashExprSql(a: Long, b: Long): String =
    s"list_min(list_transform(sh, t -> ($a * (${O.tokenHash("t")} % ${Dedup.P}) + $b) % ${Dedup.P}))"

  /** toks/shing/sig CTE prefix; `shingleN` picks 3-gram shingles (d2) or
    * the token set itself (1-grams — the d4 candidate generator).
    */
  private def sigSqlFor(shingleN: Int, pre: String = "",
      src: String = "documents"): String = {
    val sh = if (shingleN == 1) "list_distinct(tk)" else shingleSetSql
    val named = Dedup.hashParams(nHashes).zipWithIndex.map { case ((a, b), i) =>
      f"${minhashExprSql(a, b)} AS mh$i%02d"
    }
    s"""WITH ${pre}toks AS (SELECT doc_id, ${O.tokens("text")} AS tk FROM $src),
       |shing AS (SELECT doc_id, $sh AS sh FROM toks),
       |sig AS (SELECT doc_id, ${named.mkString(",\n  ")} FROM shing)""".stripMargin
  }

  private val sigSql = sigSqlFor(3)

  /** bandt CTE over `sig`: one row per (doc, band) with the band key. */
  private val bandtSql = {
    val bandSelects = (0 until bands).map { b =>
      val ks = (0 until rows).map(r => f"mh${b * rows + r}%02d").mkString(", ")
      s"SELECT doc_id, $b AS band, ${O.tokenHash(s"concat_ws(',', $ks)")} AS bkey FROM sig"
    }.mkString("\nUNION ALL\n")
    s"""bandt AS (
       |$bandSelects
       |)""".stripMargin
  }

  /** d4's scoring tail over `toks` + `pairs`: exact Jaccard on the
    * candidate doc pairs (shared verbatim by d4 and d4b — only the
    * corpus CTE differs).
    */
  private val d4TailCtes =
    """tsets AS (SELECT doc_id, list_distinct(tk) AS ts2 FROM toks),
      |j AS (
      |  SELECT doc_id1, doc_id2,
      |         CAST(len(list_intersect(a.ts2, b.ts2)) AS BIGINT) AS n_inter,
      |         CAST(len(a.ts2) + len(b.ts2) AS BIGINT) AS sz
      |  FROM pairs
      |  JOIN tsets a ON doc_id1 = a.doc_id
      |  JOIN tsets b ON doc_id2 = b.doc_id
      |)""".stripMargin

  private val d4PairsSelect =
    """SELECT doc_id1, doc_id2, n_inter, sz - n_inter AS n_union,
      |       CAST(n_inter AS DOUBLE) / CAST(sz - n_inter AS DOUBLE) AS jaccard
      |FROM j
      |WHERE CAST(n_inter AS DOUBLE) / CAST(sz - n_inter AS DOUBLE) >= CAST('0.8' AS DOUBLE)""".stripMargin

  private val d4TailSql = d4TailCtes + "\n" + d4PairsSelect

  /** d4c: the SAME committed d4 pair relation, aggregated — the oracle
    * materializes the doc pairs (it is the independent engine; its cost is
    * its own), the Spark side must reach the identical histogram from
    * class-pair weights without ever expanding pairs.
    */
  private val d4CensusSql =
    s"""dp AS (
       |$d4PairsSelect
       |)
       |SELECT CAST(floor(jaccard * 20) AS BIGINT) AS bucket,
       |       count(*) AS n_pairs,
       |       min(jaccard) AS min_jaccard, max(jaccard) AS max_jaccard
       |FROM dp GROUP BY 1""".stripMargin

  /** bandt/pairs CTE fragment over `sig`: documents agreeing on a full band. */
  private val bandPairsSql =
    s"""$bandtSql,
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS doc_id1, y.doc_id AS doc_id2
       |  FROM bandt x JOIN bandt y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
       |)""".stripMargin

  /** MAP-ONLY SimHash mirror: per-doc fold over the token-hash list —
    * bit b set ⟺ 2·|{h : bit b of h}| > |tokens| (ties clear the bit,
    * matching the Spark vote-sum > 0 rule).
    */
  private val simhashSql =
    s"""WITH hashed AS (
       |  SELECT doc_id, list_transform(${O.tokens("text")}, t -> ${O.tokenHash("t")}) AS hs
       |  FROM documents
       |),
       |sh AS (
       |  SELECT doc_id,
       |         CAST(coalesce(list_sum(list_transform(generate_series(0, 59), b ->
       |           CASE WHEN 2 * len(list_filter(hs, h -> (h >> b) & 1 = 1)) > len(hs)
       |                THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS simhash
       |  FROM hashed
       |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "d1_exact_dedup" ->
      """SELECT sha256(text) AS content_hash, count(*) AS n_docs, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1""".stripMargin,
    "d2_minhash_sig" -> (sigSql + "\nSELECT * FROM sig"),
    "d2b_lsh_pairs" -> (sigSql + ",\n" + bandPairsSql + ",\n" + {
      val eq = (0 until nHashes)
        .map(i => f"CASE WHEN s1.mh$i%02d = s2.mh$i%02d THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""j AS (
         |  SELECT doc_id1, doc_id2, CAST($eq AS BIGINT) AS n_equal
         |  FROM pairs
         |  JOIN sig s1 ON doc_id1 = s1.doc_id
         |  JOIN sig s2 ON doc_id2 = s2.doc_id
         |)
         |SELECT doc_id1, doc_id2, n_equal FROM j""".stripMargin
    }),
    "d3_simhash" -> (simhashSql + "\nSELECT doc_id, simhash FROM sh"),
    "d3b_hamming_hist" -> (simhashSql + s""",
       |slices AS (
       |  SELECT doc_id, simhash, k, (simhash >> (15 * k)) & 32767 AS slice
       |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) kk
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_id1, y.doc_id AS doc_id2,
       |         x.simhash AS s1, y.simhash AS s2
       |  FROM slices x JOIN slices y
       |    ON x.k = y.k AND x.slice = y.slice AND x.doc_id < y.doc_id
       |)
       |SELECT CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming, count(*) AS n_pairs
       |FROM cand
       |WHERE bit_count(xor(s1, s2)) <= 8
       |GROUP BY 1""".stripMargin),
    "d6_drop_list" -> (sigSql + ",\n" + bandPairsSql + "\n" + {
      val eq = (0 until nHashes)
        .map(i => f"CASE WHEN s1.mh$i%02d = s2.mh$i%02d THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""SELECT DISTINCT doc_id2 AS drop_id
         |FROM pairs
         |JOIN sig s1 ON doc_id1 = s1.doc_id
         |JOIN sig s2 ON doc_id2 = s2.doc_id
         |WHERE $eq >= 8""".stripMargin
    }),
    "d4_token_jaccard" -> (sigSqlFor(1) + ",\n" + bandPairsSql + ",\n" + d4TailSql),
    "d4b_jaccard_clustered" -> (sigSqlFor(1, clusteredCorpusSql + ",\n", "corpus2") +
      ",\n" + bandPairsSql + ",\n" + d4TailSql),
    "d4c_jaccard_census" -> (sigSqlFor(1) + ",\n" + bandPairsSql + ",\n" +
      d4TailCtes + ",\n" + d4CensusSql),
    // the WITH is RECURSIVE for the final reach CTE (min-reachability
    // closure); DuckDB scopes RECURSIVE to the whole clause
    "d10_dup_components" -> (sigSqlFor(1,
      "RECURSIVE " + clusteredCorpusSql + ",\n", "corpus2") +
      ",\n" + bandPairsSql + ",\n" + d4TailCtes + ",\n" +
      s"""dp AS (
         |$d4PairsSelect
         |),
         |e AS (SELECT doc_id1 AS a, doc_id2 AS b FROM dp),
         |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
         |nodes AS (SELECT DISTINCT a AS id FROM sym),
         |reach(src, dst) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
         |)
         |SELECT src AS doc_id, min(dst) AS comp FROM reach GROUP BY src""".stripMargin),

    "d9_incremental_drop" -> (sigSql + ",\n" + bandtSql + ",\n" + {
      val eq = (0 until nHashes)
        .map(i => f"CASE WHEN s1.mh$i%02d = s2.mh$i%02d THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""cand AS (
         |  SELECT DISTINCT n.doc_id AS drop_id, e.doc_id AS match_id
         |  FROM bandt n JOIN bandt e ON n.band = e.band AND n.bkey = e.bkey
         |  WHERE n.doc_id % 5 = 0 AND e.doc_id % 5 != 0
         |),
         |j AS (
         |  SELECT drop_id, match_id FROM cand
         |  JOIN sig s1 ON drop_id = s1.doc_id
         |  JOIN sig s2 ON match_id = s2.doc_id
         |  WHERE $eq >= 8
         |)
         |SELECT drop_id, count(*) AS n_matches, min(match_id) AS match_id
         |FROM j GROUP BY drop_id""".stripMargin
    }),
    "d8_span_census" ->
      s"""WITH toks AS (SELECT doc_id, ${O.tokens("text")} AS tk FROM documents),
         |g AS (SELECT doc_id, unnest(${ngramListSql(8)}) AS gs FROM toks),
         |h AS (SELECT doc_id, ${O.tokenHash("gs")} AS span_hash FROM g),
         |pd AS (SELECT span_hash, doc_id, count(*) AS occ FROM h GROUP BY 1, 2)
         |SELECT span_hash, count(*) AS n_docs, CAST(sum(occ) AS BIGINT) AS n_occurrences
         |FROM pd GROUP BY 1 HAVING count(*) >= 2""".stripMargin,
    // Joined on the 60-bit HASH (not the gram string) exactly as the
    // Spark side does, so even a hash collision affects both engines
    // identically.
    "dc1_decontaminate" ->
      s"""WITH toks AS (SELECT doc_id, ${O.tokens("text")} AS tk FROM documents),
         |gsets AS (SELECT doc_id, list_distinct(${ngramListSql(3)}) AS gset FROM toks),
         |g AS (SELECT doc_id, len(gset) AS n_grams, unnest(gset) AS gs FROM gsets),
         |gh AS (SELECT doc_id, n_grams, ${O.tokenHash("gs")} AS ghash FROM g),
         |bench AS (SELECT DISTINCT ghash FROM gh WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, n_grams, ghash FROM gh WHERE doc_id % 97 != 0)
         |SELECT doc_id, CAST(n_grams AS INTEGER) AS n_grams, count(*) AS n_overlap,
         |       CAST(count(*) AS DOUBLE) / CAST(n_grams AS DOUBLE) AS overlap_ratio
         |FROM tr JOIN bench USING (ghash)
         |GROUP BY doc_id, n_grams""".stripMargin
  )

  /** Word n-gram list over `tk` (ALL occurrences; wrap in list_distinct
    * for the set form) — the general-n mirror of TextHash.wordNgrams.
    */
  private def ngramListSql(n: Int): String = {
    val join = (0 until n).map(k => s"tk[i+$k]").mkString(" || ' ' || ")
    s"CASE WHEN len(tk) >= $n THEN list_transform(generate_series(1, len(tk) - ${n - 1}), i -> $join) ELSE [] END"
  }
}
