package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.{MaterializedRollup => MV, SnapshotLake}
import graft.sources.Tables

/** Dev tool: phase-by-phase timing of the mv1/mv2 refresh loops —
  * `runMain graft.tools.MvProf [mv1|mv2]`. Prints wall time and Spark
  * job count per phase (append/init/refresh/read), so the commit
  * constant (driver-side manifest+lock round trips, job launch
  * overhead) separates from the data-proportional work.
  */
object MvProf {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("mv1")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val verbose = sys.env.get("SPARK_GRAFT_MVPROF_VERBOSE").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) println(s"[mvprof]   job ${j.jobId} " +
          s"stages=${j.stageInfos.size} " +
          j.stageInfos.map(s => s"${s.name}(${s.numTasks})").mkString(" | "))
      }
    })
    def phase[A](name: String)(f: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      println(f"[mvprof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        f"jobs=${jobs.get() - j0}")
      r
    }
    for (round <- 1 to 2) {
      println(s"[mvprof] === $which round $round ===")
      import graft.functions.epochUs
      val d0 =
        if (which == "mv1") graft.operators.QueryFixtures.dbars(spark, sfDir)
        else Tables.bars(spark, sfDir)
          .withColumn("uid", col("volume").cast("long"))
      val d = d0.withColumn("bucket_ts",
        date_trunc("hour", col("ts")).cast("timestamp_ntz"))
      val work = graft.TempDirs.create(s"graft-mvprof-$which")
      val base = work + "/base"; val mv = work + "/mv"
      val spec =
        if (which == "mv1") MV.Spec(
          keyCols = Seq("symbol", "bucket_ts"), pruneKey = "bucket_ts",
          sumCols = Seq("volume"), minCols = Seq("low"), maxCols = Seq("high"),
          orderCol = Some("ts"), firstCols = Seq("open"),
          lastCols = Seq("close"))
        else MV.Spec(
          keyCols = Seq("symbol", "bucket_ts"), pruneKey = "bucket_ts",
          sumCols = Seq("volume"), distinctCols = Seq("uid"))
      val r = d.agg(min(epochUs(col("ts"))), max(epochUs(col("ts")))).head
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val (t1, t2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
      val us = epochUs(col("ts"))
      phase("append1")(SnapshotLake.append(spark, base,
        d.filter(us <= t1).repartition(2), statsCols = Seq("bucket_ts")))
      phase("init")(MV.init(spark, base, mv, spec))
      phase("append2")(SnapshotLake.append(spark, base,
        d.filter(us > t1 && us <= t2).repartition(2),
        statsCols = Seq("bucket_ts")))
      phase("refresh1")(MV.refresh(spark, base, mv, spec))
      phase("append3")(SnapshotLake.append(spark, base,
        d.filter(us > t2).repartition(2), statsCols = Seq("bucket_ts")))
      phase("refresh2")(MV.refresh(spark, base, mv, spec))
      phase("readFinal")(MV.readFinal(spark, mv, spec)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
