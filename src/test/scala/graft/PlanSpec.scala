package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan hygiene: the properties that make these operators survive
  * a 100 TB scale-up are asserted here, not just claimed in Scaladoc —
  * broadcasts where a side is dimension-sized, top-k instead of global
  * sort, scan-level filter/projection pushdown, map-side partial
  * aggregation.
  */
class PlanSpec extends SparkSpec {
  override def sfDir: String = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // let AQE finalize
    def unwrap(p: SparkPlan): String = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case other => other.toString
    }
    unwrap(df.queryExecution.executedPlan)
  }

  test("j1 dim join broadcasts the customer side") {
    assert(plan("j1_orders_by_nation").contains("BroadcastHashJoin"))
  }

  test("j3/j4 semi and anti joins stay semi/anti (no payload materialization)") {
    assert(plan("j3_customers_with_orders").contains("LeftSemi"))
    assert(plan("j4_customers_without_orders").contains("LeftAnti"))
  }

  test("t2 latest-n plans TakeOrderedAndProject, not a global sort") {
    val p = plan("t2_latest_n")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("filters and projections reach the parquet scan") {
    val p = SparkEntry.queries("f9_time_range")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") || p.contains("pushedFilters"))
    // a 2-column projection must not read all columns
    val q = SparkEntry.queries("a6_docs_by_source")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(q.contains("ReadSchema: struct<source:string>"))
  }

  test("aggregations are partial (map-side combine) before the exchange") {
    val p = plan("a5_grouped_stats")
    val firstAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0)
    // partial agg must appear below (later in string = deeper) the exchange
    assert(p.lastIndexOf("HashAggregate") > exchange)
  }

  test("whole-stage codegen covers the cleaning chain") {
    // codegen'd operators print with the "*(stageId)" prefix
    val p = plan("clean_pipeline")
    assert(p.contains("WholeStageCodegen") || p.contains("*("))
  }

  test("d4 at scale: equi-joins only — no cartesian, no nested-loop fallback") {
    val p = plan("d4_token_jaccard")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // the class-collapse groupBy and the band equi-join are both present
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate") ||
      p.contains("SortAggregate"))
  }

  test("d5 block-size guard rides the join partitioning, output still top-n") {
    val p = plan("d5_embedding_top_pairs")
    assert(p.contains("TakeOrderedAndProject")) // global top-n, not a sort
    assert(!p.contains("CartesianProduct"))
  }

  test("p1b scale split: labeling is window-free (pure filters over the scan)") {
    import org.apache.spark.sql.functions._
    // cutoffs are computed eagerly over DISTINCT timestamps; the frame the
    // caller gets back must be a plain projection — no Window, no sort
    val events = graft.sources.Tables.events(spark, sfDir)
    val out = graft.operators.Split.chronologicalAtScale(events, col("ts"),
      Seq(0.8), Seq("train", "test"), exact = true)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Window"))
    assert(!p.contains("Sort"))
  }

  test("connector scan plans one partition per symbol x slice, no shuffle") {
    val read = spark.read.format(classOf[graft.sources.connector.KlineSource].getName)
      .option("symbols", "AAA,BBB,CCC")
      .option("startMs", 0L).option("endMs", 3600000L)
      .option("slices", 5).load()
    assert(read.rdd.getNumPartitions == 15)
    val p = read.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange")) // ingestion is map-only
  }
}
