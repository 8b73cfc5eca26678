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
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    import graft.operators._
    for (q <- Seq("d4_token_jaccard", "d2b_lsh_pairs", "d3_simhash",
        "d3b_hamming_hist", "d6_drop_list")) {
      time(q) {
        val df = DedupQueries.queries(q)(spark, dir)
        df.write.format("noop").mode("overwrite").save()
      }
    }
    println(s"[scratch] d4 rows=${DedupQueries.queries("d4_token_jaccard")(spark, dir).count()}")
    spark.stop()
  }
}
