package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** Dev tool: split v5's cost into codebook training vs the encode+ADC
  * query (each twice — cold then warm). Lesson recorded from the round-4
  * tuning: the HOF formulation (transform/array_sort/aggregate) evaluates
  * interpreted but MATERIALIZES intermediate arrays once per row; a
  * "flattened" literal-arithmetic rewrite re-evaluated the whole
  * 32-distance array on every element_at reference and ran 65x SLOWER —
  * expression trees are not CSE'd across references, materialization
  * beats codegen when a subtree is consumed many times.
  */
object PqProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.1")
    for (i <- 1 to 2) {
      var t0 = System.nanoTime()
      val cbs = VectorOps.pqCodebooks(emb, 16, 32, 2, 3)
      println(f"[prof] train: ${(System.nanoTime()-t0)/1e9}%.2f s")
      t0 = System.nanoTime()
      VectorOps.pqTopK(emb.filter(col("vec_id") < 8), emb, 10, cbs)
        .write.format("noop").mode("overwrite").save()
      println(f"[prof] adc query: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
