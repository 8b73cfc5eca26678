package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** Dev tool: measure PQ ADC recall@10 vs brute force across codebook
  * configurations on the sf0.1 embeddings (used to pick v5_pq_topk's
  * parameters; keep for re-tuning when the corpus changes).
  */
object PqTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.1")
    val q = emb.filter(col("vec_id") < 8)
    def hits(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val truth = hits(VectorOps.bruteTopK(q, emb, 10))
    for ((m, k, it) <- Seq((16, 16, 2), (16, 32, 2), (16, 64, 2),
        (32, 8, 2), (32, 16, 2), (32, 32, 2))) {
      val cb = VectorOps.pqCodebooks(emb, m, k, it, sampleMod = 3)
      val pq = hits(VectorOps.pqTopK(q, emb, 10, cb))
      val recall = truth.map { case (qid, t) =>
        pq.getOrElse(qid, Set.empty[Long]).intersect(t).size / 10.0
      }.sum / truth.size
      // shortlist coverage: fraction of the true top-10 inside ADC top-C
      def cover(c: Int): Double = {
        val top = VectorOps.pqTopK(q, emb, c, cb)
          .select("query_id", "neighbor_id").collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
        truth.map { case (qid, t) =>
          top.getOrElse(qid, Set.empty[Long]).intersect(t).size / 10.0
        }.sum / truth.size
      }
      println(f"[pqtune] m=$m%2d ksub=$k%2d iters=$it recall@10=$recall%.3f refine@50=${cover(50)}%.3f refine@100=${cover(100)}%.3f")
    }
    spark.stop()
  }
}
