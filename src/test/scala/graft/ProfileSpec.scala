package graft

import org.apache.spark.sql.functions._

import graft.operators.{Profile, Sketch}

/** Dataset profiler: exact census metrics, HLL distincts limited to
  * string/integral columns, quantiles == exact percentiles of the same
  * bottom-k sample, and loud failure on unknown columns.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "a", Some(10.0)),
    (2L, "b", Some(20.0)),
    (3L, "a", None),
    (4L, "c", Some(40.0)),
    (5L, "b", Some(50.0))
  ).toDF("id", "s", "v")

  private def metric(rows: Array[org.apache.spark.sql.Row], c: String,
      m: String): Option[Double] =
    rows.collectFirst {
      case r if r.getString(0) == c && r.getString(1) == m =>
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)
    }

  test("census metrics are exact; shape is one tall row per metric") {
    val rows = Profile.dataset(df, keyCol = "id").collect()
    assert(metric(rows, "id", "count").contains(5.0))
    assert(metric(rows, "v", "n_nulls").contains(1.0))
    assert(metric(rows, "s", "n_nulls").contains(0.0))
    assert(metric(rows, "v", "min").contains(10.0))
    assert(metric(rows, "v", "max").contains(50.0))
    // string column: no numeric metrics, but an HLL distinct
    assert(metric(rows, "s", "min").isEmpty)
    assert(metric(rows, "s", "approx_distinct").exists(d =>
      math.abs(d - 3.0) < 0.2))
    // double column: no approx_distinct (float formatting isn't canonical
    // across engines)
    assert(metric(rows, "v", "approx_distinct").isEmpty)
    // id (long) gets both numeric metrics and a distinct estimate
    assert(metric(rows, "id", "approx_distinct").exists(d =>
      math.abs(d - 5.0) < 0.3))
  }

  test("quantiles == exact percentile of the SAME bottom-k sample") {
    val n = 5000
    val big = (1 to n).map(i => (i.toLong, (i * 7 % n).toDouble))
      .toDF("id", "v")
    val rows = Profile.dataset(big, keyCol = "id", cols = Seq("v"),
      k = 256).collect()
    val sample = Sketch.sampleBottomK(big, Nil, col("id"), 256)
    val exact = sample.agg(
      percentile(col("v"), lit(0.25)),
      percentile(col("v"), lit(0.5)),
      percentile(col("v"), lit(0.75))).head
    assert(metric(rows, "v", "q25").contains(exact.getDouble(0)))
    assert(metric(rows, "v", "q50").contains(exact.getDouble(1)))
    assert(metric(rows, "v", "q75").contains(exact.getDouble(2)))
    // sample-of-256 median of a uniform permutation lands near the true
    // median (rank error O(1/sqrt k))
    assert(math.abs(metric(rows, "v", "q50").get - n / 2.0) < n * 0.15)
  }

  test("unknown profile column fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Profile.dataset(df, keyCol = "id", cols = Seq("nope"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
