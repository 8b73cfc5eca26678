package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug._

/** Dev tool: print a declared query's whole-stage-codegen subtrees and the
  * kernel-call lines inside them — how the round-6 conditional-CSE gap was
  * confirmed (9 text_stats compute() calls per row in the generated code
  * for qualityScore). `runMain graft.tools.CodegenDump <sfDir> <query>`.
  */
object CodegenDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    val cg = df.queryExecution.debug.codegenToSeq()
    cg.zipWithIndex.foreach { case ((subtree, code, _), i) =>
      println(s"===== subtree $i =====")
      println(subtree)
      val hits = code.linesIterator.filter(l => l.contains("textStats") || l.contains("compute(")).toSeq
      println(s"-- compute-call lines: ${hits.size}")
      hits.take(20).foreach(println)
    }
    spark.stop()
  }
}
