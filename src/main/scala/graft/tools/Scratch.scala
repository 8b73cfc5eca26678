package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val hour = 3600 * 1000L
    val fmt = classOf[graft.sources.connector.KlineSource].getName
    def readFrom(startMs: Long) = spark.read.format(fmt)
      .option("symbols", "BTCUSDT")
      .option("startMs", startMs).option("endMs", 6 * hour)
      .option("intervalMs", 60000L).option("mockBars", 100000)
      .load()
    val resumeMs = (3 * hour - 60000L) + 1L
    val rest = readFrom(resumeMs)
    println(s"[scratch] rest=${rest.count()} distinct=${rest.select("ts").distinct().count()}")
    rest.groupBy("ts").count().filter(col("count") > 1).show(5, false)
    rest.orderBy("ts").select("ts").limit(3).show(false)
    spark.stop()
  }
}
