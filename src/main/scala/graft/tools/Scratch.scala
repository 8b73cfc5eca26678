package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling probe — contents change constantly; not part of the
  * library surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import graft.operators._
    val d = QueryFixtures.dbars(spark, dir)
    time("dbars.count")(d.count())
    val b = Cleaning.filterNonNegative(d, Seq("volume"))
    time("nonneg.count")(b.count())
    val bounds = b.agg(min("close").as("__mn"), max("close").as("__mx"))
    time("bounds.collect")(bounds.collect().foreach(println))
    val joined = b.crossJoin(broadcast(bounds))
      .withColumn("__w", (col("__mx") - col("__mn")) / lit(100.0))
      .withColumn("bucket",
        least(floor((col("close") - col("__mn")) / col("__w")), lit(99.0)).cast("long"))
    time("joined.count")(joined.count())
    val grouped = joined.groupBy("bucket", "__mn", "__w")
      .agg(graft.functions.exactSum(col("volume")).as("bucket_volume"), count(lit(1)).as("n_bars"))
    time("grouped.count")(grouped.count())
    spark.stop()
  }
}
