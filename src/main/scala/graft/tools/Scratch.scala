package graft.tools

import org.apache.spark.sql.SparkSession

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
    for (q <- Seq("d3b_hamming_hist", "d3b_hamming_hist")) {
      val df = DedupQueries.queries(q)(spark, dir)
      time(q)(df.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
