package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{epochUs, exactSum, exactSumOneMinus, exactSumPrice, OracleSql => O}
import graft.sources.Tables
import QueryFixtures.{dbars, dbarsSql}

/** Declared-query catalog for SURVEY §2.6: sorts/limits/top-k, unions, mode,
  * the relational join surface (broadcast dim join, fact-fact join,
  * semi/anti), set ops, and the as-of join.
  *
  * Scale notes are attached to each operator: the dim join broadcasts
  * (customer ≪ orders), the fact-fact join is a shuffle join on the shared
  * key (AQE picks SMJ and handles skew), semi/anti avoid payload
  * materialization, top-k plans TakeOrderedAndProject (no global sort), and
  * the as-of join is the union-ffill pattern from [[AsOfJoin]].
  */
object RelQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // T2 — ORDER BY ts DESC LIMIT n → TakeOrderedAndProject, no full sort.
    "t2_latest_n" -> ((s, dir) =>
      Tables.events(s, dir)
        .orderBy(col("ts").desc, col("event_id").desc).limit(100)
        .select(col("event_id"), epochUs(col("ts")).as("ts_us"),
          col("event_type"), col("value"))),
    // T4 — union of monthly-archive-style shards (unionByName).
    "t4_union" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.filter(col("value") < 0.3).withColumn("shard", lit("lo"))
        .unionByName(e.filter(col("value") > 0.7).withColumn("shard", lit("hi")))
        .select(col("event_id"), col("shard"), col("value"))
    }),
    // T5 — mode (most common interval) per symbol, deterministic tie-break.
    "t5_mode_interval" -> ((s, dir) => {
      val w = Window.partitionBy(col("symbol")).orderBy(col("ts"), col("event_id"))
      val iv = Tables.bars(s, dir)
        .withColumn("interval_us", epochUs(col("ts")) - lag(epochUs(col("ts")), 1).over(w))
        .filter(col("interval_us").isNotNull)
        .groupBy("symbol", "interval_us").agg(count(lit(1)).as("n"))
      val rk = Window.partitionBy(col("symbol"))
        .orderBy(col("n").desc, col("interval_us"))
      iv.withColumn("__rn", row_number().over(rk)).filter(col("__rn") === 1)
        .select("symbol", "interval_us", "n")
    }),
    // J1 — fact ⋈ broadcast(dim): Catalyst would broadcast anyway at this
    // size, the hint makes the 100 TB intent explicit.
    "j1_orders_by_nation" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"),
          exactSumPrice(col("o_totalprice")).as("sum_totalprice"))),
    // J2 — fact ⋈ fact on the shared key; shuffle join, AQE-managed.
    "j2_revenue_by_status" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(exactSumOneMinus(col("l_extendedprice"), col("l_discount"))
          .as("revenue"),
          count(lit(1)).as("n_items"))),
    // J3 — left-semi: customers having orders (no payload from right side).
    "j3_customers_with_orders" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_customers"))),
    // J4 — left-anti: customers without orders.
    "j4_customers_without_orders" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_customers"))),
    // J5 — as-of join: every 3rd event probes the latest deduped bar at or
    // before its timestamp for the same symbol.
    "j5_asof_quotes" -> ((s, dir) => {
      val probes = Tables.events(s, dir)
        .filter(col("event_id") % 3 === 0)
        .select(col("event_id"), col("event_type").as("symbol"), col("ts"))
      val quotes = dbars(s, dir).select(col("symbol"), col("ts"), col("close"))
      AsOfJoin.asof(probes, quotes, Seq("symbol"), "ts", Seq("close"))
        .select(col("event_id"), col("symbol"), epochUs(col("ts")).as("ts_us"),
          col("right_close"))
    }),
    // RJ1 — bucketed range join: events → tumbling 2h-of-6h "sessions".
    // The interval side explodes onto overlapped chunks; the join is an
    // equi-join on chunk + residual filter (no BroadcastNestedLoop).
    "rj1_range_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val t0 = e.agg(min(epochUs(col("ts"))).as("__t0"))
      val sessions = s.range(2000).toDF("k")
        .crossJoin(broadcast(t0))
        .select(col("k"),
          timestamp_micros(col("__t0") + col("k") * lit(21600000000L))
            .cast("timestamp_ntz").as("s_start"),
          timestamp_micros(col("__t0") + col("k") * lit(21600000000L) + lit(7199999999L))
            .cast("timestamp_ntz").as("s_end"))
      RangeJoin.pointInInterval(e, sessions, Seq.empty, "ts", "s_start", "s_end",
          bucketUs = 7200000000L)
        .groupBy("k")
        .agg(count(lit(1)).as("n_events"), exactSum(col("value")).as("sum_value"))
        .withColumnRenamed("k", "session_id")
    }),
    // SE1 — gap-based sessionization via session_window: one exchange on
    // user_id, session merging inside the aggregate (no WindowExec, no
    // per-user total order). 24 h gap over the sparse synthetic events
    // (~1.2 k sessions, ~8 events each at sf0.01).
    "se1_sessionize" -> ((s, dir) =>
      Sessionize.sessionize(Tables.events(s, dir),
        col("user_id"), col("ts"), col("value"), gapSeconds = 86400L)),
    // R1/R2 — rollup & cube subtotal surfaces (free Catalyst capabilities,
    // declared + oracle-checked per SURVEY §2.4's note).
    "r1_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(exactSum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))),
    "r2_cube" -> ((s, dir) =>
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(exactSumPrice(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n"))),
    // S1 — INTERSECT: supplier keys seen in lineitem ∩ low-nation suppliers.
    "s1_intersect" -> ((s, dir) =>
      Tables.lineitem(s, dir).select(col("l_suppkey").as("suppkey"))
        .intersect(Tables.supplier(s, dir).filter(col("s_nationkey") < 13)
          .select(col("s_suppkey").as("suppkey")))),
    // S2 — EXCEPT: suppliers with no lineitems.
    "s2_except" -> ((s, dir) =>
      Tables.supplier(s, dir).select(col("s_suppkey").as("suppkey"))
        .except(Tables.lineitem(s, dir).select(col("l_suppkey").as("suppkey"))))
  )

  val oracle: Map[String, String] = Map(
    "t2_latest_n" ->
      s"""SELECT event_id, ${O.epochUs("CAST(ts AS TIMESTAMP)")} AS ts_us, event_type, value
         |FROM events ORDER BY ts DESC, event_id DESC LIMIT 100""".stripMargin,
    "t4_union" ->
      """SELECT event_id, 'lo' AS shard, value FROM events WHERE value < 0.3
        |UNION ALL
        |SELECT event_id, 'hi' AS shard, value FROM events WHERE value > 0.7""".stripMargin,
    "t5_mode_interval" -> (Tables.barsSql +
      s""", iv AS (
         |  SELECT symbol,
         |         epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY symbol ORDER BY ts, event_id) AS interval_us
         |  FROM bars
         |), cnt AS (
         |  SELECT symbol, interval_us, count(*) AS n FROM iv
         |  WHERE interval_us IS NOT NULL GROUP BY symbol, interval_us
         |)
         |SELECT symbol, interval_us, n
         |FROM (SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY n DESC, interval_us) AS rn FROM cnt)
         |WHERE rn = 1""".stripMargin),
    "j1_orders_by_nation" ->
      s"""SELECT c_nationkey, count(*) AS n_orders,
         |       ${O.exactSumPrice("o_totalprice")} AS sum_totalprice
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_nationkey""".stripMargin,
    "j2_revenue_by_status" ->
      s"""SELECT o_orderstatus,
         |       ${O.exactSumOneMinus("l_extendedprice", "l_discount")} AS revenue,
         |       count(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderstatus""".stripMargin,
    "j3_customers_with_orders" ->
      """SELECT c_nationkey, count(*) AS n_customers
        |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey""".stripMargin,
    "j4_customers_without_orders" ->
      """SELECT c_nationkey, count(*) AS n_customers
        |FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey""".stripMargin,
    "j5_asof_quotes" -> (dbarsSql +
      s""", probes AS (
         |  SELECT event_id, event_type AS symbol, CAST(ts AS TIMESTAMP) AS ts
         |  FROM events WHERE event_id % 3 = 0
         |)
         |SELECT p.event_id, p.symbol, epoch_us(p.ts) AS ts_us, q.close AS right_close
         |FROM probes p ASOF LEFT JOIN dbars q
         |  ON p.symbol = q.symbol AND p.ts >= q.ts""".stripMargin),
    "rj1_range_join" ->
      s"""WITH t0 AS (SELECT min(${O.epochUs("CAST(ts AS TIMESTAMP)")}) AS t0 FROM events),
         |sessions AS (
         |  SELECT k, make_timestamp(t0 + k * 21600000000) AS s_start,
         |         make_timestamp(t0 + k * 21600000000 + 7199999999) AS s_end
         |  FROM t0 CROSS JOIN (SELECT unnest(generate_series(0, 1999)) AS k) kk
         |)
         |SELECT k AS session_id, count(*) AS n_events,
         |       ${O.exactSum("value")} AS sum_value
         |FROM events e JOIN sessions s
         |  ON CAST(e.ts AS TIMESTAMP) >= s.s_start AND CAST(e.ts AS TIMESTAMP) <= s.s_end
         |GROUP BY k""".stripMargin,
    // Gaps-and-islands replay of session_window's merge rule: a new
    // session starts only when the quiet gap EXCEEDS the 24 h window
    // (events exactly `gap` apart merge — probed Spark semantics, pinned
    // in SessionizeSpec).
    "se1_sessionize" ->
      s"""WITH o AS (
         |  SELECT user_id, event_id, value,
         |         ${O.epochUs("CAST(ts AS TIMESTAMP)")} AS tus,
         |         lag(${O.epochUs("CAST(ts AS TIMESTAMP)")}) OVER
         |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         |  FROM events
         |), f AS (
         |  SELECT user_id, event_id, tus, value,
         |         CASE WHEN prev IS NULL OR tus - prev > 86400000000 THEN 1 ELSE 0 END AS ns
         |  FROM o
         |), s AS (
         |  SELECT user_id, tus, value,
         |         sum(ns) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |                       ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM f
         |)
         |SELECT user_id, min(tus) AS session_start_us, max(tus) AS session_end_us,
         |       count(*) AS n_events, ${O.exactSum("value")} AS sum_value
         |FROM s GROUP BY user_id, sid""".stripMargin,
    "r1_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, ${O.exactSum("l_quantity")} AS sum_qty,
         |       count(*) AS n
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "r2_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, ${O.exactSumPrice("o_totalprice")} AS sum_price,
         |       count(*) AS n
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "s1_intersect" ->
      """SELECT l_suppkey AS suppkey FROM lineitem
        |INTERSECT
        |SELECT s_suppkey AS suppkey FROM supplier WHERE s_nationkey < 13""".stripMargin,
    "s2_except" ->
      """SELECT s_suppkey AS suppkey FROM supplier
        |EXCEPT
        |SELECT l_suppkey AS suppkey FROM lineitem""".stripMargin
  )
}
