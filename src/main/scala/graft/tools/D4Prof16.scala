package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextHash, TextNative}

/** Round-16 optimization-round stage profiler for the CURRENT
  * jaccardPairsAtScale pipeline (broadcast class lookup +
  * SortedIntersectSize): times each stage under the Bench session shape so
  * the d4-family seconds can be attributed before touching the operator.
  * `runMain graft.tools.D4Prof16 [sfDir]`.
  */
object D4Prof16 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d4prof16] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("warmup")(spark.range(1000000).selectExpr("sum(id)").collect())
    val n = 16; val bands = 4; val rowsPerBand = 4
    def classesF = docs
      .select(col("doc_id"),
        sort_array(array_distinct(TextNative.tokens(col("text")))).as("__ts"))
      .groupBy("__ts").agg(collect_list(col("doc_id")).as("__members"))
      .withColumn("cid", array_min(col("__members")))
    val classes = classesF
    t("classes noop x1")(classes.write.format("noop").mode("overwrite").save())
    t("classes noop x2")(classes.write.format("noop").mode("overwrite").save())
    val hashed = classes.select(col("cid"),
      TextNative.minhashFromHashes(TextNative.hashModP(col("__ts")), n).as("__sig"))
    val csig = hashed.select(col("cid") +: (0 until n).map(i =>
      element_at(col("__sig"), i + 1).as(f"mh$i%02d")): _*)
    val bandCols = (0 until bands).map { b =>
      val ks = (0 until rowsPerBand).map(r => col(f"mh${b * rowsPerBand + r}%02d"))
      struct(lit(b).as("band"), TextHash.tokenHash(concat_ws(",", ks: _*)).as("bkey"))
    }
    val exploded = csig
      .select(col("cid"), explode(array(bandCols: _*)).as("bk"))
      .select(col("cid"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val classPairsRaw = exploded.as("x")
      .join(exploded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.cid") < col("y.cid"))
      .select(col("x.cid").as("cid1"), col("y.cid").as("cid2"))
    t("bandjoin nodistinct noop")(
      classPairsRaw.write.format("noop").mode("overwrite").save())
    val classPairs = classPairsRaw.distinct()
    t("bandjoin+distinct noop")(
      classPairs.write.format("noop").mode("overwrite").save())
    val info = broadcast(classes.select(col("cid"), col("__ts"), col("__members")))
    val enriched = classPairs
      .join(info.as("i1"), col("cid1") === col("i1.cid"))
      .join(info.as("i2"), col("cid2") === col("i2.cid"))
      .select(col("i1.__ts").as("__tsa"), col("i1.__members").as("__ma"),
        col("i2.__ts").as("__tsb"), col("i2.__members").as("__mb"))
    val classJ = enriched
      .select(col("__ma"), col("__mb"),
        TextNative.sortedIntersectSize(col("__tsa"), col("__tsb"))
          .cast("long").as("n_inter"),
        (size(col("__tsa")) + size(col("__tsb"))).cast("long").as("__sz"))
      .select(col("__ma"), col("__mb"), col("n_inter"),
        (col("__sz") - col("n_inter")).as("n_union"))
      .withColumn("jaccard",
        try_divide(col("n_inter").cast("double"), col("n_union").cast("double")))
      .filter(col("jaccard") >= 0.8)
    t("classJ noop")(classJ.write.format("noop").mode("overwrite").save())
    val cross = classJ
      .select(explode(col("__ma")).as("__a"), col("__mb"),
        col("n_inter"), col("n_union"), col("jaccard"))
      .select(col("__a"), explode(col("__mb")).as("__b"),
        col("n_inter"), col("n_union"), col("jaccard"))
      .select(least(col("__a"), col("__b")).as("doc_id1"),
        greatest(col("__a"), col("__b")).as("doc_id2"),
        col("n_inter"), col("n_union"), col("jaccard"))
    t("cross-expansion noop")(cross.write.format("noop").mode("overwrite").save())
    println("  classPairs=" + classPairs.count() + " classJ=" + classJ.count() +
      " cross=" + cross.count())
    spark.stop()
  }
}
