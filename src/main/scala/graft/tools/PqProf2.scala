package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** Dev tool: decompose the 10M ADC scan cost — encode-only, score-only
  * (pre-encoded codes cached), and the fused scan.
  */
object PqProf2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.{Pq, TopK}
    val nVec = 10000000L
    val vecs = spark.range(nVec).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)), i =>
        ((pmod(xxhash64(col("id") * lit(65L) + i), lit(2001L)) - lit(1000L))
          .cast("double") / lit(1000.0)).cast("float")).as("embedding")).cache()
    vecs.count()
    val cbs = VectorOps.pqCodebooks(vecs, 16, 32, 2, sampleMod = 199)
    val cbArr = cbs.map(_.map(_._2))
    val queries = vecs.filter(col("vec_id") < 8)
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof2] $label%-24s ${(System.nanoTime()-t0)/1e9}%6.1f s")
    }
    t("encode-only") {
      vecs.select(col("vec_id"), Pq.encode(col("embedding"), cbArr).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    val codes = vecs.select(col("vec_id"),
      Pq.encode(col("embedding"), cbArr).as("__codes")).cache()
    codes.count()
    t("score+topk-precoded") {
      val q = broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"), VectorOps.norm2(col("embedding")).as("__n2q")))
      val scored = codes.crossJoin(q)
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          Pq.adcCosine(col("__codes"), col("qv"), col("__n2q"), cbArr).as("approx_cosine"))
      scored.groupBy("query_id")
        .agg(TopK.topK(col("approx_cosine"), col("neighbor_id"), 10).as("t"))
        .collect()
    }
    t("score-only-sum") {
      val q = broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"), VectorOps.norm2(col("embedding")).as("__n2q")))
      codes.crossJoin(q)
        .select(Pq.adcCosine(col("__codes"), col("qv"), col("__n2q"), cbArr).as("a"))
        .agg(sum("a")).collect()
    }
    t("fused-pqTopK") {
      VectorOps.pqTopK(queries, vecs, 10, cbs).count()
    }
    codes.unpersist(); spark.stop()
  }
}
