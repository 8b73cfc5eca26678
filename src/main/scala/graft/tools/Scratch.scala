package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    import graft.operators._
    val df = IndicatorQueries.queries("w9_indicators_all")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    println(s"[scratch] Sort nodes: ${"\\bSort\\b".r.findAllIn(p).length}, Exchange: ${"Exchange".r.findAllIn(p).length}, Window: ${"Window".r.findAllIn(p).length}")
    time("w9 noop x1")(df.write.format("noop").mode("overwrite").save())
    time("w9 noop x2")(df.write.format("noop").mode("overwrite").save())
    val n = df.count()
    println(s"[scratch] rows=$n")
    spark.stop()
  }
}
