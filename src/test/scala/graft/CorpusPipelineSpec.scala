package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusPipeline

/** Planted-fixture proof that the composed corpus pipeline applies every
  * stage, in order: quality gate → exact dedup → decontamination →
  * token packing. Each planted doc is built to fail exactly one stage
  * (or none), so a stage silently not running changes the output set.
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // Quality-passing shape: 24 distinct tokens, one stopword "the",
  // 10 four-letter + 13 five-letter words → mean word length 4.5
  // (inside the 4.3–4.7 band), zero repeated bigrams, zero symbols.
  private val docA =
    "the mesh node path disk heap lock byte page scan sort batch query table value index merge shard slice graph frame block chunk tuple"
  private val docC =
    "the wire port cell gate ring fold pipe seed leaf root actor fiber queue stack token float inode mount patch trace width depth scale"
  private val docD =
    "the atom card dial echo flag grid host icon jolt kite audit brick cargo delta ember flint gauge hinge ivory jewel knack lathe maple"

  test("pipeline drops low-quality, duplicate, and contaminated docs; packs the rest") {
    val docs = Seq(
      (0L, docD + " extra words here beyond", "s"), // benchmark class (0 % 97 == 0)
      (1L, docA, "s"), // survivor
      (2L, docA, "s"), // exact dup of 1 → dedup drops it
      (3L, docC, "s"), // survivor
      (4L, docD, "s"), // verbatim inside the benchmark doc → decontaminated
      (5L, "tiny doc", "s") // fails the quality gate (too_short)
    ).toDF("doc_id", "text", "source")
    val out = CorpusPipeline.run(docs, col("text"), col("doc_id"))
      .as[(Long, String, Int, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "s", 24, 0L, 0L),
      (3L, "s", 24, 0L, 24L)))
  }

  test("benchmark residue class is excluded from training even when clean") {
    // doc 0 is quality-passing and unique, but sits in the bench class
    val docs = Seq((0L, docA, "s"), (1L, docC, "s")).toDF("doc_id", "text", "source")
    val out = CorpusPipeline.run(docs, col("text"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }
}
