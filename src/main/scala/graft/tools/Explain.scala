package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of declared queries and time
  * them. Usage: runMain graft.tools.Explain <sfDir> <queryName>[,<name2>…]
  * (or "all" to just time everything, no plans).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).getOrElse("all")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val targets =
      if (names == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else names.split(',').toSeq
    targets.foreach { name =>
      // t0 BEFORE construction: iterative operators (connected components,
      // ANN index builds) do their heavy work eagerly via localCheckpoint
      // while the frame is being built — counting only the result would
      // time a cache read
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      if (names != "all") {
        println(s"===== $name =====")
        df.explain("formatted")
      }
      // noop sink, not count(): count lets Catalyst prune every computed
      // column (a pure-projection query would time almost nothing) —
      // same discipline as Bench
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
