package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, CreateNamedStruct, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

import graft.functions.{Ema, IvfAssignTopN, JavaLog, LshBucket, MinhashSig, PqAdcCosine, PqEncode, TermFreqs, TextStats, Tokens, TopKByScore, WordNgramHashes}
import graft.operators.TextOps

/** SQL surface for graft's custom Catalyst expressions: registers
  *   - `ema(x, alpha)` — the recursive EMA window function
  *     (`SELECT ema(close, 0.15) OVER (PARTITION BY symbol ORDER BY ts) …`)
  *   - `jlog(x)` — libm-rounding natural log
  *   - `top_k(score, id, k)` — the bounded-heap per-group top-k aggregate
  *     (`SELECT query_id, top_k(cosine, neighbor_id, 10) FROM scored
  *     GROUP BY query_id`)
  *   - the ANN stack (VERDICT r4 item 8): `lsh_bucket(v, planes, dims)`,
  *     `ivf_assign(v, n2, n, cents [, cids])`, `pq_encode(v, codebooks)`,
  *     `pq_adc(codes, qv, n2q, codebooks)` — codebook arguments are
  *     FOLDABLE array literals the builder evaluates ONCE at resolution
  *     into the expression object, so the plan tree still carries a
  *     pointer (the `addReferenceObj` discipline), not a wall of
  *     nested-array text
  * so SQL-first users get the same operators as the DataFrame API.
  *
  * Two registration paths: `GraftExtensions` for
  * `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  * (the SparkSessionExtensions route), and [[GraftFunctions.register]] for
  * an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // continuous-aggregate serve: rewrite coarse OHLCV windows over a
    // registered raw source to scan its roll-up (RollupCatalog). For a
    // live session use spark.experimental.extraOptimizations instead.
    e.injectOptimizerRule(_ => RollupRewrite)
    // metadata-only count/min/max over snapshot-lake reads — collapses
    // to a LocalRelation from the manifest's row counts + envelopes
    e.injectOptimizerRule(_ => ManifestAggRewrite)
  }
}

object GraftFunctions {

  private def emaBuilder(args: Seq[Expression]): Expression = {
    require(args.size == 2, "ema(x, alpha) takes exactly 2 arguments")
    Ema(Cast(args.head, DoubleType), Cast(args(1), DoubleType))
  }

  private def jlogBuilder(args: Seq[Expression]): Expression = {
    require(args.size == 1, "jlog(x) takes exactly 1 argument")
    JavaLog(Cast(args.head, DoubleType))
  }

  private def topKBuilder(args: Seq[Expression]): Expression = {
    require(args.size == 3, "top_k(score, id, k) takes exactly 3 arguments")
    val k = args(2) match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) => v.toInt
      case other => throw new IllegalArgumentException(
        s"top_k's k must be an integer literal, got $other")
    }
    TopKByScore(CreateNamedStruct(Seq(
      Literal("score"), Cast(args.head, DoubleType),
      Literal("id"), Cast(args(1), LongType))), k)
  }

  // ---- foldable-argument extraction for the ANN builders: the codebook
  // arrives as SQL array syntax (a CreateArray tree); it must be foldable
  // so resolution can evaluate it ONCE into the expression object.
  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) =>
      require(v >= Int.MinValue && v <= Int.MaxValue,
        s"$what out of int range: $v") // silent .toInt truncation would
      v.toInt                          // turn 2^32+1 planes into 1
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def folded(e: Expression, tpe: DataType, what: String): Any = {
    val cast = Cast(e, tpe)
    require(cast.resolved && cast.foldable,
      s"$what must be a foldable array literal of type ${tpe.sql}")
    cast.eval()
  }

  private def doubles2(e: Expression, what: String): Array[Array[Double]] =
    folded(e, ArrayType(ArrayType(DoubleType)), what).asInstanceOf[ArrayData]
      .toObjectArray(ArrayType(DoubleType))
      .map(_.asInstanceOf[ArrayData].toDoubleArray())

  private def doubles3(e: Expression, what: String): Array[Array[Array[Double]]] =
    folded(e, ArrayType(ArrayType(ArrayType(DoubleType))), what)
      .asInstanceOf[ArrayData]
      .toObjectArray(ArrayType(ArrayType(DoubleType)))
      .map(_.asInstanceOf[ArrayData]
        .toObjectArray(ArrayType(DoubleType))
        .map(_.asInstanceOf[ArrayData].toDoubleArray()))

  private def floatArr(e: Expression): Expression =
    Cast(e, ArrayType(FloatType))

  private def lshBuilder(args: Seq[Expression]): Expression = {
    require(args.size == 3, "lsh_bucket(v, planes, dims) takes exactly 3 arguments")
    LshBucket(floatArr(args.head),
      intLit(args(1), "planes"), intLit(args(2), "dims"))
  }

  private def ivfBuilder(args: Seq[Expression]): Expression = {
    require(args.size == 4 || args.size == 5,
      "ivf_assign(v, n2, n, cents [, cids]) takes 4 or 5 arguments")
    val cents = doubles2(args(3), "cents")
    val cids =
      if (args.size == 5)
        folded(args(4), ArrayType(LongType), "cids")
          .asInstanceOf[ArrayData].toLongArray()
      else Array.tabulate(cents.length)(_.toLong)
    IvfAssignTopN(floatArr(args.head), Cast(args(1), DoubleType),
      cids, cents, intLit(args(2), "n"))
  }

  private def pqEncodeBuilder(args: Seq[Expression]): Expression = {
    require(args.size == 2, "pq_encode(v, codebooks) takes exactly 2 arguments")
    PqEncode(floatArr(args.head), doubles3(args(1), "codebooks"))
  }

  private def pqAdcBuilder(args: Seq[Expression]): Expression = {
    require(args.size == 4,
      "pq_adc(codes, qv, n2q, codebooks) takes exactly 4 arguments")
    PqAdcCosine(Cast(args.head, ArrayType(LongType)), floatArr(args(1)),
      Cast(args(2), DoubleType), doubles3(args(3), "codebooks"))
  }

  // ---- text-kernel builders (round 6): the native one-pass document
  // census / signature expressions, SQL-callable
  private def str(e: Expression): Expression =
    Cast(e, org.apache.spark.sql.types.StringType)

  private def textStatsBuilder(args: Seq[Expression]): Expression = {
    require(args.size == 1, "text_stats(text) takes exactly 1 argument")
    TextStats(str(args.head), TextOps.EnStopwords)
  }

  private def tokensBuilder(args: Seq[Expression]): Expression = {
    require(args.size == 1, "tokens(text) takes exactly 1 argument")
    Tokens(str(args.head))
  }

  private def ngramHashesBuilder(args: Seq[Expression]): Expression = {
    require(args.size == 3,
      "ngram_hashes(text, n, distinct) takes exactly 3 arguments")
    val dist = args(2) match {
      case Literal(b: Boolean, org.apache.spark.sql.types.BooleanType) => b
      case other => throw new IllegalArgumentException(
        s"ngram_hashes' distinct must be a boolean literal, got $other")
    }
    WordNgramHashes(str(args.head), intLit(args(1), "n"), dist)
  }

  private def minhashSigBuilder(args: Seq[Expression]): Expression = {
    require(args.size == 3,
      "minhash_sig(text, shingleN, nHashes) takes exactly 3 arguments")
    MinhashSig(str(args.head), intLit(args(1), "shingleN"),
      intLit(args(2), "nHashes"))
  }

  private def termFreqsBuilder(args: Seq[Expression]): Expression = {
    require(args.size == 2, "term_freqs(text, terms) takes exactly 2 arguments")
    val terms = folded(args(1),
      ArrayType(org.apache.spark.sql.types.StringType), "terms")
      .asInstanceOf[ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq
    TermFreqs(str(args.head), terms)
  }

  val builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("ema",
      new ExpressionInfo(classOf[Ema].getName, "ema"),
      emaBuilder _),
    ("jlog",
      new ExpressionInfo(classOf[JavaLog].getName, "jlog"),
      jlogBuilder _),
    ("top_k",
      new ExpressionInfo(classOf[TopKByScore].getName, "top_k"),
      topKBuilder _),
    ("lsh_bucket",
      new ExpressionInfo(classOf[LshBucket].getName, "lsh_bucket"),
      lshBuilder _),
    ("ivf_assign",
      new ExpressionInfo(classOf[IvfAssignTopN].getName, "ivf_assign"),
      ivfBuilder _),
    ("pq_encode",
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      pqEncodeBuilder _),
    ("pq_adc",
      new ExpressionInfo(classOf[PqAdcCosine].getName, "pq_adc"),
      pqAdcBuilder _),
    ("text_stats",
      new ExpressionInfo(classOf[TextStats].getName, "text_stats"),
      textStatsBuilder _),
    ("tokens",
      new ExpressionInfo(classOf[Tokens].getName, "tokens"),
      tokensBuilder _),
    ("ngram_hashes",
      new ExpressionInfo(classOf[WordNgramHashes].getName, "ngram_hashes"),
      ngramHashesBuilder _),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      minhashSigBuilder _),
    ("term_freqs",
      new ExpressionInfo(classOf[TermFreqs].getName, "term_freqs"),
      termFreqsBuilder _))

  /** Register on a live session (tests, REPLs). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
