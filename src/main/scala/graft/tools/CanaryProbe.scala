package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev tool: run the bench harness's host canaries standalone —
  * `runMain graft.tools.CanaryProbe [n]`. Prints the CPU canary (fixed
  * 50 M-row hash-agg), the memory-bandwidth canary (fixed ~512 MB
  * full-shuffle materialization), and the disk-I/O canary (fixed 512 MB
  * O_DIRECT read — round 16, see Bench) n times each, for adjudicating
  * a host window without paying for a suite sweep. Must stay
  * byte-identical to the probes in [[graft.Bench]].
  */
object CanaryProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val ioProbeFile = {
      val p = java.nio.file.Files.createTempFile("graft-io-canary", ".bin")
      p.toFile.deleteOnExit()
      val w = new ProcessBuilder("dd", "if=/dev/zero", s"of=$p",
        "bs=1M", "count=512", "conv=fsync")
        .redirectErrorStream(true).start()
      w.getInputStream.readAllBytes()
      if (w.waitFor() == 0) Some(p) else None
    }
    def canaryIo(): Double = ioProbeFile.map { p =>
      time {
        val r = new ProcessBuilder("dd", s"if=$p", "of=/dev/null",
          "bs=1M", "iflag=direct").redirectErrorStream(true).start()
        r.getInputStream.readAllBytes()
        require(r.waitFor() == 0, "dd direct read failed")
      }
    }.getOrElse(-1.0)
    for (i <- 1 to n) {
      val c = time {
        spark.range(0, 50000000L, 1, 32)
          .selectExpr("xxhash64(id) % 97 AS k", "id")
          .groupBy("k").agg(org.apache.spark.sql.functions.sum("id"))
          .write.format("noop").mode("overwrite").save()
      }
      val m = time {
        spark.range(0, 4000000L, 1, 32)
          .selectExpr("id", "rpad(cast(id AS string), 128, 'x') AS payload")
          .repartition(32, col("id"))
          .write.format("noop").mode("overwrite").save()
      }
      val io = canaryIo()
      println(f"[canary] run$i cpu=$c%.3f s mem=$m%.3f s io=$io%.3f s")
    }
    spark.stop()
  }
}
