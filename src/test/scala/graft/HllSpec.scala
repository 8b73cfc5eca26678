package graft

import org.apache.spark.sql.functions._

import graft.operators.Hll

/** Mergeable HLL sketches: accuracy floors vs exact counts, exact
  * merge/rollup algebra (max is associative — incremental == one-shot,
  * fine-group rollup == direct coarse sketch), NULL semantics.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  test("accuracy floors vs exact distinct: p=12 within 5%, p=9 within 15%") {
    // 60k rows, 20k distinct keys, skewed repetition
    val d = (0 until 60000).map(i => ("g", (i % 20000).toLong))
      .toDF("g", "v")
    for ((p, tol) <- Seq((12, 0.05), (9, 0.15))) {
      val est = Hll.approxDistinct(d, Seq("g"), col("v"), p)
        .head.getDouble(1)
      val err = math.abs(est - 20000.0) / 20000.0
      assert(err <= tol, s"p=$p estimate $est err $err > $tol")
    }
  }

  test("incremental merge == one-shot sketch, exactly; rollup to coarse " +
      "groups == direct coarse sketch") {
    val all = (0 until 5000)
      .map(i => (s"t${i % 4}", ((i * 2654435761L) % 1800).toString))
      .toDF("typ", "v")
    val p = 9
    // split by arbitrary predicate, sketch each, merge
    val a = Hll.registers(all.filter($"v".substr(1, 1) =!= "1"),
      Seq("typ"), col("v"), p)
    val b = Hll.registers(all.filter($"v".substr(1, 1) === "1"),
      Seq("typ"), col("v"), p)
    val merged = Hll.mergeRegisters(a, b, Seq("typ"))
    val oneShot = Hll.registers(all, Seq("typ"), col("v"), p)
    assert(merged.exceptAll(oneShot).isEmpty && oneShot.exceptAll(merged).isEmpty)
    // roll fine groups up to ONE coarse group: re-key + merge == direct
    val coarse = Hll.mergeRegisters(
      oneShot.withColumn("typ", lit("all")),
      oneShot.limit(0).withColumn("typ", lit("all")), Seq("typ"))
    val direct = Hll.registers(all.withColumn("typ", lit("all")),
      Seq("typ"), col("v"), p)
    assert(coarse.exceptAll(direct).isEmpty && direct.exceptAll(coarse).isEmpty)
    val estC = Hll.estimate(coarse, Seq("typ"), p).head.getDouble(1)
    val estD = Hll.estimate(direct, Seq("typ"), p).head.getDouble(1)
    assert(estC == estD)
  }

  test("registerStream folds micro-batches into a snapshot register " +
      "lake; replays re-merge to the identical state; live estimate == " +
      "one-shot batch sketch") {
    val root = TempDirs.create("hllstream") + "/lake"
    val all = (0 until 3000)
      .map(i => (s"t${i % 2}", ((i * 7919L) % 1000).toString))
      .toDF("g", "v")
    def regSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Int)] =
      df.select("g", "slot", "r").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val h = Hll.registerStream(root, Seq("g"), col("v"), p = 9)
    h(all.filter($"v".cast("long") < 300), 0L)
    h(all.filter($"v".cast("long") >= 300), 1L)
    val afterBoth = regSet(graft.sinks.SnapshotLake.read(spark, root))
    // replayed batch: max-merge is idempotent — state unchanged
    h(all.filter($"v".cast("long") >= 300), 1L)
    assert(regSet(graft.sinks.SnapshotLake.read(spark, root)) == afterBoth)
    // streamed register lake == the one-shot batch sketch, register for
    // register, so the estimates are identical doubles
    assert(afterBoth == regSet(Hll.registers(all, Seq("g"), col("v"), 9)))
    val live = Hll.estimate(graft.sinks.SnapshotLake.read(spark, root),
      Seq("g"), 9).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val batch = Hll.approxDistinct(all, Seq("g"), col("v"), 9)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(live == batch)
  }

  test("NULLs are skipped (COUNT DISTINCT semantics); tiny cardinalities " +
      "land in the near-exact linear-counting branch") {
    val d = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", Some(3L)),
      ("a", None), ("a", Some(1L))).toDF("g", "v")
    val est = Hll.approxDistinct(d, Seq("g"), col("v"), p = 12)
      .head.getDouble(1)
    assert(math.round(est) == 3L, s"got $est")
  }
}
