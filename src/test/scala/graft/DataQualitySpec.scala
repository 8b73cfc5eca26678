package graft

import org.apache.spark.sql.functions._

import graft.operators.DataQuality
import graft.operators.DataQuality._

/** Declarative DQ suite: verdict arithmetic, three-valued-logic edges,
  * and the one-scan plan contract.
  */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixture = Seq(
    // (id, name, score, grade)
    (Some(1L), Some("alpha"), Some(10.0), Some("A")),
    (Some(2L), Some("beta"), Some(-3.0), Some("B")),   // negative score
    (Some(3L), None, Some(120.0), Some("C")),          // null name, >hi
    (Some(4L), Some("delta"), None, Some("dd")),       // null score, bad grade
    (Some(1L), Some("alpha"), Some(10.0), Some("A")),  // dup key (1, alpha)
    (None, Some("ghost"), Some(5.0), Some("B"))        // null id
  ).toDF("id", "name", "score", "grade")

  private def verdictMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getDouble(2), r.getBoolean(4))).toMap

  test("every check type computes the right violation count and verdict") {
    val out = verdictMap(DataQuality.verify(fixture, Seq(
      NotNull("name"),
      NotNull("grade"),
      Completeness("score", 0.8),
      NonNegative("score"),
      InRange("score", 0.0, 100.0),
      RowRule("score_lt_200", col("score") < 200),
      UniqueKey(Seq("id", "name")),
      MinRows(5),
      MatchesRegex("grade", "[A-F]"))))
    assert(out(("not_null", "name")) == (1.0, false))
    assert(out(("not_null", "grade")) == (0.0, true))
    // 5 of 6 scores non-null
    assert(out(("completeness", "score")) == (5.0 / 6.0, true))
    assert(out(("non_negative", "score")) == (1.0, false)) // -3 only; null skipped
    assert(out(("in_range", "score")) == (2.0, false))     // -3 and 120
    // NULL predicate is NOT a violation (row 4: null score)
    assert(out(("row_rule", "score_lt_200")) == (0.0, true))
    // 5 fully non-null tuples, 4 distinct -> 1 dup; any-null tuple ignored
    assert(out(("unique_key", "id,name")) == (1.0, false))
    assert(out(("min_rows", "*")) == (6.0, true))
    assert(out(("matches_regex", "grade")) == (1.0, false)) // "dd"
  }

  test("the whole suite is ONE scan of the input — N constraints, 1 pass") {
    val dir = TempDirs.create("dq-onescan")
    fixture.write.mode("overwrite").parquet(s"$dir/t")
    val t = spark.read.parquet(s"$dir/t")
    val plan = DataQuality.verify(t, Seq(
      NotNull("name"), Completeness("score", 0.5), NonNegative("score"),
      InRange("score", 0, 100), MinRows(1), MatchesRegex("grade", "[A-F]"),
      UniqueKey(Seq("id", "name")) // distinct rides the same scan via Expand
    )).queryExecution.executedPlan
    // AdaptiveSparkPlan hides its subtree from `children` pre-execution —
    // count scans in the rendered plan instead
    val rendered = plan.toString
    assert("FileScan".r.findAllIn(rendered).size == 1,
      s"expected exactly one file scan, plan:\n$rendered")
    // and the distinct for unique_key rode the same scan (no second scan,
    // no Expand — Spark plans single-distinct as a two-level aggregate)
    assert(!rendered.contains("Expand"))
  }

  test("referential integrity counts distinct orphan keys; clean side passes") {
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val fact = Seq(1L, 1L, 2L, 9L, 9L, 7L).toDF("fk") // orphans {9, 7}
    val bad = DataQuality.referentialIntegrity(fact, "fk", dim, "k").collect()(0)
    assert(bad.getString(0) == "referential_integrity")
    assert(bad.getDouble(2) == 2.0 && !bad.getBoolean(4))
    val clean = DataQuality.referentialIntegrity(
      fact.filter(col("fk") < 3), "fk", dim, "k").collect()(0)
    assert(clean.getDouble(2) == 0.0 && clean.getBoolean(4))
  }

  test("quarantine tags each row with exactly its violated rules, in " +
      "check order, with no extra scan") {
    val routed = DataQuality.quarantine(fixture, Seq(
      NotNull("name"),
      NonNegative("score"),
      MatchesRegex("grade", "[A-F]")))
    val tags = routed.collect().map { r =>
      val idIdx = r.fieldIndex("id")
      val k = if (r.isNullAt(idIdx)) None else Some(r.getLong(idIdx))
      (k, r.getSeq[String](r.fieldIndex("_violations")))
    }.toMap
    assert(tags(Some(2L)) == Seq("non_negative:score"))
    assert(tags(Some(3L)) == Seq("not_null:name"))
    assert(tags(Some(4L)) == Seq("matches_regex:grade"))
    assert(tags(Some(1L)).isEmpty && tags(None).isEmpty)
    // clean/quarantine split shares the single pass — no shuffle, no agg
    val plan = routed.filter(size(col("_violations")) === 0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Aggregate"))
    // dataset-level checks refuse per-row routing
    val e = intercept[IllegalArgumentException] {
      DataQuality.quarantine(fixture, Seq(UniqueKey(Seq("id"))))
    }
    assert(e.getMessage.contains("dataset-level"))
  }

  test("observed metrics ride the frame's own pass — batch and per-batch " +
      "on a stream") {
    // batch: counts surface through the observation without a second job
    val observed = DataQuality.observed(fixture, Seq(
      NotNull("name"), NonNegative("score")), name = "dqb")
    observed.collect()
    val row = observed.queryExecution.observedMetrics("dqb")
    assert(row.getAs[Long]("rows") == 6L)
    assert(row.getAs[Long]("not_null:name") == 1L)
    assert(row.getAs[Long]("non_negative:score") == 1L)
    // stream: per-micro-batch violation counts in the progress events
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ms = MemoryStream[(String, Double)](spark)
    val q = DataQuality.observed(
        ms.toDF().toDF("name", "score"),
        Seq(NonNegative("score")), name = "dqs")
      .writeStream.format("noop").start()
    ms.addData(("a", 1.0), ("b", -2.0), ("c", -3.0))
    q.processAllAvailable()
    val m = q.lastProgress.observedMetrics.get("dqs")
    assert(m.getAs[Long]("rows") == 3L)
    assert(m.getAs[Long]("non_negative:score") == 2L)
    q.stop()
  }

  test("composed streaming ingest: quarantine routes each micro-batch " +
      "into clean/bad snapshot lakes exactly-once, observed counts ride " +
      "along") {
    import graft.sinks.SnapshotLake
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val cleanRoot = TempDirs.create("dq-clean") + "/lake"
    val badRoot = TempDirs.create("dq-bad") + "/lake"
    val checks = Seq(NonNegative("score"), NotNull("name"))
    val cleanSink = SnapshotLake.appendStream(cleanRoot, streamId = "clean")
    val badSink = SnapshotLake.appendStream(badRoot, streamId = "bad")
    val ms = MemoryStream[(String, Double)](spark)
    val q = DataQuality.observed(ms.toDF().toDF("name", "score"),
        checks, name = "gate")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val routed = DataQuality.quarantine(batch, checks).cache()
        try {
          cleanSink(routed.filter(size(col("_violations")) === 0)
            .drop("_violations"), id)
          badSink(routed.filter(size(col("_violations")) > 0)
            .withColumn("_violations", array_join(col("_violations"), ",")), id)
        } finally routed.unpersist()
      }
      .start()
    ms.addData(("a", 1.0), ("b", -2.0), ("c", 3.0))
    q.processAllAvailable()
    ms.addData(("d", -4.0), ("e", 5.0))
    q.processAllAvailable()
    val m = q.lastProgress.observedMetrics.get("gate")
    assert(m.getAs[Long]("rows") == 2L &&
      m.getAs[Long]("non_negative:score") == 1L) // last batch
    q.stop()
    assert(SnapshotLake.read(spark, cleanRoot).count() == 3) // a, c, e
    val bad = SnapshotLake.read(spark, badRoot)
    assert(bad.count() == 2)
    assert(bad.select("_violations").collect()
      .forall(_.getString(0) == "non_negative:score"))
    // replay-safety end-to-end: re-delivering the last batch is a no-op
    cleanSink(SnapshotLake.read(spark, cleanRoot).limit(1), 1L)
    assert(SnapshotLake.read(spark, cleanRoot).count() == 3)
  }

  test("verdict frame unions across datasets into one report") {
    val a = DataQuality.verify(fixture, Seq(MinRows(1)))
    val b = DataQuality.referentialIntegrity(
      Seq(1L).toDF("fk"), "fk", Seq(1L).toDF("k"), "k")
    val report = a.unionByName(b)
    assert(report.count() == 2)
    assert(report.filter(!col("pass")).count() == 0)
  }
}
