package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.plans.GraftFunctions

class SkewAndSqlSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct aggregation on a skewed key") {
    // 90% of rows on one hot key
    val df = (1 to 10000).map { i =>
      (if (i % 10 == 0) s"cold${i % 97}" else "HOT", i.toLong, i * 0.5)
    }.toDF("k", "id", "v")
    val direct = df.groupBy("k").agg(
      count(lit(1)).as("n"),
      sum(col("v").cast("decimal(38,10)")).cast("double").as("sum"),
      min("v").as("min"), max("v").as("max"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Skew.saltedStats(df, col("k"), col("id"), col("v"), buckets = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted == direct)
    // and the salt actually spreads the hot key
    val spread = df.withColumn("__salt", Skew.salt(col("id"), 8))
      .filter(col("k") === "HOT").select("__salt").distinct().count()
    assert(spread == 8)
  }

  test("ema and jlog are callable from SQL after registration") {
    GraftFunctions.register(spark)
    Seq(("s", 1L, 10.0), ("s", 2L, 20.0), ("s", 3L, 30.0))
      .toDF("symbol", "t", "x").createOrReplaceTempView("sql_bars")
    val rows = spark.sql(
      """SELECT t, ema(x, 0.5) OVER (PARTITION BY symbol ORDER BY t) AS e,
        |       jlog(x) AS l
        |FROM sql_bars ORDER BY t""".stripMargin).collect()
    assert(rows.map(_.getDouble(1)).toSeq == Seq(10.0, 15.0, 22.5))
    assert(rows.head.getDouble(2) == math.log(10.0))
  }
}
