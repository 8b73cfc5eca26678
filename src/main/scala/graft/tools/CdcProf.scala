package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.SnapshotLake
import graft.sources.Tables

/** Dev tool: phase-by-phase timing of the cdc4 streaming change feed —
  * `runMain graft.tools.CdcProf`. Splits the query's wall into lake
  * build, stream bootstrap, the three triggers and the memory-sink
  * read-back, so the diff cost separates from the commit/trigger
  * constants.
  */
object CdcProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def phase[A](name: String)(f: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      println(f"[cdcprof] $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        f"jobs=${jobs.get() - j0}")
      r
    }
    for (round <- 1 to 2) {
      println(s"[cdcprof] === round $round ===")
      val b = Tables.bars(spark, sfDir)
        .select(col("event_id"), col("symbol"), col("ts"), col("close"))
        .withColumn("ver", lit(1L))
      val work = graft.TempDirs.create("graft-cdcprof")
      val root = s"$work/lake"
      val mid = 500000000L
      phase("append1")(SnapshotLake.append(spark, root,
        b.filter(col("event_id") < mid).repartition(2),
        statsCols = Seq("event_id")))
      phase("append2")(SnapshotLake.append(spark, root,
        b.filter(col("event_id") >= mid).repartition(2),
        statsCols = Seq("event_id")))
      val sinkName = "cdcprof_feed_" + round
      val q = phase("streamStart")(
        spark.readStream.format("graft-snapshot")
          .option("readChangeFeed", "true").option("keyCols", "event_id")
          .load(root)
          .writeStream.format("memory").queryName(sinkName)
          .option("checkpointLocation", s"$work/ckpt").start())
      try {
        phase("trigger1-snap")(q.processAllAvailable())
        val updates = b.filter(col("event_id") % 10 === 0)
          .withColumn("close", col("close") + lit(1.0))
          .withColumn("ver", lit(2L))
          .unionByName(b.filter(col("event_id") % 1000 === 7)
            .withColumn("event_id", col("event_id") + lit(1000000000000L))
            .withColumn("ver", lit(2L)))
        phase("merge")(SnapshotLake.merge(spark, root, updates,
          keyCols = Seq("event_id"), versionCol = "ver",
          pruneKey = "event_id"))
        phase("trigger2-merge")(q.processAllAvailable())
        phase("delete")(SnapshotLake.delete(spark, root,
          col("event_id") % 97 === 3))
        phase("trigger3-delete")(q.processAllAvailable())
      } finally q.stop()
      phase("sinkRead")(spark.table(sinkName)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
