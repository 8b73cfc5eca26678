package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time ONE declared query under the exact Bench session shape
  * (local[32], 32 shuffle partitions, noop sink, min over reps) —
  * `runMain graft.tools.QBench <name>[,<name>...] [reps]`. For iterating
  * on a single query's constant without paying a full 148-query sweep;
  * the committed artifact is still Bench/gate.sh.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q1_agg").split(',').toSeq
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(50000000L).selectExpr("count(xxhash64(id))").collect() // warm
    // Bench's CPU canary, VERBATIM (hash-agg over a fixed range), so
    // qbench numbers normalize exactly like the committed artifacts (min
    // of before/after). Round-14 lesson: this block used to run the
    // MEMORY canary's rpad-shuffle body at the CPU canary's 50 M rows —
    // ~12x the intended work — printing 5-6 s against ref 0.487 and
    // forcing every solo adjudication onto a co-run anchor query.
    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 50000000L, 1, 32)
        .selectExpr("xxhash64(id) % 97 AS k", "id")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("id"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val c1 = canary()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qbench] $name%-28s min=${times.min}%6.2f s  " +
        f"runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    val c = math.min(c1, canary())
    println(f"[qbench] canary_sec=$c%.3f (ref 0.487; normalized = " +
      "min * 0.487 / canary_sec)")
    spark.stop()
  }
}
