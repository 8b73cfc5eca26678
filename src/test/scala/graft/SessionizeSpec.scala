package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Sessionize

/** Gap-based sessionization ([[graft.operators.Sessionize]]): boundary
  * semantics (merge at exactly-gap, split just past it), equivalence of the
  * session_window form and the gaps-and-islands window form, and the
  * exactly-one-exchange/no-WindowExec plan shape of the scale path.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: 3 events at 0s/10s/25s — with gap=10s: {0,10} merge (diff == gap
  // merges), 25 splits (diff 15 > gap). user 2: single event.
  private lazy val events = Seq(
    (1L, 101L, "2024-01-01 00:00:00", 1.0),
    (1L, 102L, "2024-01-01 00:00:10", 2.0),
    (1L, 103L, "2024-01-01 00:00:25", 4.0),
    (2L, 201L, "2024-01-01 00:00:00", 8.0)
  ).map { case (u, e, t, v) => (u, e, ts(t), v) }
    .toDF("user_id", "event_id", "ts", "value")

  test("session_window boundary: diff == gap merges, diff > gap splits") {
    val out = Sessionize
      .sessionize(events, col("user_id"), col("ts"), col("value"), 10L)
      .orderBy("user_id", "session_start_us")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.length === 3)
    // user 1 session A: events 101+102 (merged across the exact-gap boundary)
    assert(out(0) === ((1L, 1704067200000000L, 1704067210000000L, 2L, 3.0)))
    // user 1 session B: event 103 alone
    assert(out(1) === ((1L, 1704067225000000L, 1704067225000000L, 1L, 4.0)))
    assert(out(2) === ((2L, 1704067200000000L, 1704067200000000L, 1L, 8.0)))
  }

  test("withSessionIndex agrees with session_window on session boundaries") {
    val idx = Sessionize.withSessionIndex(events, col("user_id"), col("ts"),
      col("event_id"), 10L)
    val viaIdx = idx.groupBy("user_id", "session_idx")
      .agg(min(unix_micros(col("ts").cast("timestamp"))).as("session_start_us"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start_us", "n_events")
    val viaNative = Sessionize
      .sessionize(events, col("user_id"), col("ts"), col("value"), 10L)
      .select("user_id", "session_start_us", "n_events")
    assert(viaIdx.except(viaNative).isEmpty && viaNative.except(viaIdx).isEmpty)
  }

  test("withSessionIndex ordinals are 1-based and chronological per user") {
    val idx = Sessionize.withSessionIndex(events, col("user_id"), col("ts"),
      col("event_id"), 10L)
    val u1 = idx.filter(col("user_id") === 1L).orderBy("event_id")
      .select("session_idx").as[Long].collect()
    assert(u1.toSeq === Seq(1L, 1L, 2L))
  }

  test("se1 scale path: one exchange on the session key, no WindowExec") {
    val plan = graft.SparkEntry
      .queries("se1_sessionize")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window pass:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
