package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketch

/** Bottom-k hash samples: membership algebra (salted two-phase trim ==
  * one global trim; merge == one-shot; replayed batches are idempotent),
  * quantile accuracy floors vs exact percentiles.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def data(n: Int, groups: Int) =
    (0 until n).map(i => (s"g${i % groups}", i.toLong, i.toDouble))
      .toDF("g", "id", "v")

  test("salted two-phase trim == the one-window global bottom-k, exactly") {
    val d = data(20000, 3)
    val sample = Sketch.sampleBottomK(d, Seq("g"), col("id"), k = 100)
    // reference: global sort by (hk, ks) per group, take 100
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("__hk"), col("__ks"))
    val ref = d.withColumn("__ks", col("id").cast("string"))
      .withColumn("__hk", graft.functions.TextHash.tokenHash(col("__ks")))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 100)
      .drop("__rn")
    assert(sample.count() == 300)
    assert(sample.exceptAll(ref).isEmpty && ref.exceptAll(sample).isEmpty)
  }

  test("merge(sample(A), sample(B)) == sample(A ∪ B); replayed rows are " +
      "idempotent; fine groups roll up to coarse") {
    val d = data(30000, 2)
    val (a, b) = (d.filter($"id" % 3 === 0), d.filter($"id" % 3 =!= 0))
    val k = 250
    // collected-set comparison: exceptAll over shared-lineage self-unions
    // trips a Catalyst binding bug, and sets are the cleaner assertion
    def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
      df.select("g", "id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val merged = Sketch.mergeSamples(
      Sketch.sampleBottomK(a, Seq("g"), col("id"), k),
      Sketch.sampleBottomK(b, Seq("g"), col("id"), k), Seq("g"), k)
    val oneShot = Sketch.sampleBottomK(d, Seq("g"), col("id"), k)
    assert(rows(merged) == rows(oneShot))
    // replay: merging a sample with itself changes nothing
    val replayed = Sketch.mergeSamples(oneShot, oneShot, Seq("g"), k)
    assert(rows(replayed) == rows(oneShot))
    // rollup: re-key both fine groups to one coarse group and re-trim ==
    // direct coarse sample
    val coarse = Sketch.mergeSamples(
      oneShot.withColumn("g", lit("all")),
      oneShot.limit(0).withColumn("g", lit("all")), Seq("g"), k)
    val direct = Sketch.sampleBottomK(d.withColumn("g", lit("all")),
      Seq("g"), col("id"), k)
    assert(rows(coarse) == rows(direct))
  }

  test("sampleStream maintains the bottom-k sample in a snapshot lake: " +
      "batches fold in via atomic replace, replays converge, live " +
      "sample == one-shot batch sample") {
    val root = TempDirs.create("sketchstream") + "/lake"
    val d = data(9000, 2)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
      df.select("g", "id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    val h = Sketch.sampleStream(root, Seq("g"), col("id"), k = 150)
    h(d.filter($"id" % 3 === 0), 0L)
    h(d.filter($"id" % 3 === 1), 1L)
    h(d.filter($"id" % 3 === 2), 2L)
    val live = graft.sinks.SnapshotLake.read(spark, root)
    assert(rows(live) == rows(Sketch.sampleBottomK(d, Seq("g"), col("id"), 150)))
    // replayed batch: same sample re-derived, state unchanged
    h(d.filter($"id" % 3 === 2), 2L)
    assert(rows(graft.sinks.SnapshotLake.read(spark, root)) == rows(live))
    // history shows append + replace commits; quantiles serve off the lake
    val ops = graft.sinks.SnapshotLake.history(spark, root)
      .select("op").collect().map(_.getString(0)).toSet
    assert(ops == Set("append", "replace"))
    val q = Sketch.quantiles(graft.sinks.SnapshotLake.read(spark, root),
      Seq("g"), col("v"), Seq(0.5)).collect()
    assert(q.length == 2 && q.forall(r => !r.isNullAt(1)))
  }

  test("heavyHitters == brute-force threshold counts: exact n/share, " +
      "full recall at e^(-k*minShare) miss odds, light tail excluded") {
    // zipf-ish: value v = floor(sqrt(i % 4096)) — share(v) ~ (2v+1)/4096
    val d = (0 until 40960)
      .map(i => (s"g${i % 2}", i.toLong, math.sqrt(i % 4096).toLong))
      .toDF("g", "id", "v")
    val got = Sketch.heavyHitters(d, Seq("g"), col("id"), col("v"),
      k = 2048, minShare = 0.02)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val want = d.groupBy("g", "v").agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") / lit(20480.0))
      .filter(col("share") >= 0.02)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(want.nonEmpty && got == want)
    // the heaviest item's exact count survives verbatim
    val top = want.maxBy(_._2._1)
    assert(got(top._1) == top._2)
  }

  test("sample quantiles track exact quantiles within O(1/sqrt(k)) rank " +
      "error") {
    val n = 100000
    val d = data(n, 1)
    val k = 4096
    val est = Sketch.approxQuantiles(d, Seq("g"), col("id"), col("v"),
      k, Seq(0.25, 0.5, 0.9)).head
    // v is uniform 0..n-1: true quantiles are q*n; rank error ~1/sqrt(k)
    val tol = 3.0 / math.sqrt(k) * n // 3 sigma
    for ((q, i) <- Seq(0.25, 0.5, 0.9).zipWithIndex) {
      val got = est.getDouble(i + 1)
      assert(math.abs(got - q * n) <= tol,
        s"q=$q got $got want ~${q * n} tol $tol")
    }
  }
}
