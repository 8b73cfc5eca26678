package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, CreateNamedStruct, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.functions.{Ema, JavaLog, TopKByScore}

/** SQL surface for graft's custom Catalyst expressions: registers
  *   - `ema(x, alpha)` — the recursive EMA window function
  *     (`SELECT ema(close, 0.15) OVER (PARTITION BY symbol ORDER BY ts) …`)
  *   - `jlog(x)` — libm-rounding natural log
  *   - `top_k(score, id, k)` — the bounded-heap per-group top-k aggregate
  *     (`SELECT query_id, top_k(cosine, neighbor_id, 10) FROM scored
  *     GROUP BY query_id`)
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

  val builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("ema",
      new ExpressionInfo(classOf[Ema].getName, "ema"),
      emaBuilder _),
    ("jlog",
      new ExpressionInfo(classOf[JavaLog].getName, "jlog"),
      jlogBuilder _),
    ("top_k",
      new ExpressionInfo(classOf[TopKByScore].getName, "top_k"),
      topKBuilder _))

  /** Register on a live session (tests, REPLs). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
