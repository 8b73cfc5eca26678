package graft

import org.apache.spark.sql.functions._

import graft.sources.connector._

/** Offline connector tests (SURVEY §2.1 S1/S2/S4): retry/backoff unit
  * semantics on the transport, then the DSv2 source end-to-end — paging,
  * slice parallelism, overlap dedup, cursor resume, and into the clean
  * chain.
  */
class ConnectorSpec extends SparkSpec {

  private val fmt = classOf[KlineSource].getName
  private val hour = 3600 * 1000L

  test("resilient transport backs off exponentially and rethrows at max") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    // every page fails its first attempt -> one retry each, sleep = 1000*2^0
    val t = new ResilientTransport(
      new MockTransport(0L, 60000L, bars = 2500, failFirstAttemptEvery = 1),
      maxRetries = 3, retryDelayMs = 1000L, sleeper = sleeps.append(_))
    assert(t.fetch("BTCUSDT", 0L, 1000).size == 1000)
    assert(sleeps.toSeq == Seq(1000L))
    assert(t.errorStats("network_errors") == 1)
    // a transport that NEVER succeeds exhausts maxRetries with 1s,2s waits
    val always = new KlineTransport {
      def fetch(s: String, st: Long, l: Int) =
        throw new Transport.TransientError("down")
    }
    val sleeps2 = scala.collection.mutable.ArrayBuffer[Long]()
    val t2 = new ResilientTransport(always, 3, 1000L, sleeps2.append(_))
    intercept[Transport.TransientError] { t2.fetch("X", 0L, 10) }
    assert(sleeps2.toSeq == Seq(1000L, 2000L)) // 2 backoffs, 3rd attempt rethrows
  }

  test("rate limit waits the server's Retry-After then succeeds") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val t = new ResilientTransport(
      new MockTransport(0L, 60000L, bars = 100,
        rateLimitOnce = Some(0L), retryAfterMs = 777L),
      maxRetries = 3, retryDelayMs = 1000L, sleeper = sleeps.append(_))
    assert(t.fetch("BTCUSDT", 0L, 50).size == 50)
    assert(sleeps.toSeq == Seq(777L))
    assert(t.errorStats("rate_limit_hits") == 1)
  }

  test("mock pages are ascending, inclusive of the cursor candle, and deterministic") {
    val t = new MockTransport(0L, 60000L, bars = 2500)
    val p1 = t.fetch("BTCUSDT", 0L, 1000)
    assert(p1.size == 1000 && p1.head.tsMs == 0L && p1.last.tsMs == 999 * 60000L)
    assert(p1.map(_.tsMs) == p1.map(_.tsMs).sorted)
    // the reference's cursor: next fetch FROM the last ts re-serves it
    val p2 = t.fetch("BTCUSDT", p1.last.tsMs, 1000)
    assert(p2.head.tsMs == p1.last.tsMs) // overlap row
    assert(p2.head == p1.last) // and bit-identical values
    assert(t.fetch("BTCUSDT", 2500L * 60000L, 1000).isEmpty) // past the grid
  }

  test("DSv2 read: symbols x slices partitions, no dup rows, deterministic") {
    val read = spark.read.format(fmt)
      .option("symbols", "BTCUSDT,ETHUSDT")
      .option("startMs", 0L).option("endMs", 24 * hour) // 1440 minutes
      .option("intervalMs", 60000L).option("mockBars", 100000)
      .option("slices", 6).option("pageSize", 250)
      .load()
    assert(read.schema.fieldNames.toSeq ==
      Seq("ts", "symbol", "open", "high", "low", "close", "volume", "turnover"))
    assert(read.rdd.getNumPartitions == 12) // 2 symbols x 6 slices
    val n = read.count()
    assert(n == 2 * 1440, s"got $n")
    // overlapping pages deduped at the source: (symbol, ts) unique
    assert(read.select("symbol", "ts").distinct().count() == n)
    // two reads agree bit-for-bit (deterministic candle function)
    val h1 = read.agg(sum(hash(col("*")).cast("long"))).collect().head.getLong(0)
    val h2 = spark.read.format(fmt)
      .option("symbols", "BTCUSDT,ETHUSDT")
      .option("startMs", 0L).option("endMs", 24 * hour)
      .option("intervalMs", 60000L).option("mockBars", 100000)
      .option("slices", 3).option("pageSize", 1000) // different partitioning
      .load().agg(sum(hash(col("*")).cast("long"))).collect().head.getLong(0)
    assert(h1 == h2)
  }

  test("injected page faults are retried inside partitions, not failures") {
    val read = spark.read.format(fmt)
      .option("symbols", "BTCUSDT")
      .option("startMs", 0L).option("endMs", 12 * hour)
      .option("intervalMs", 60000L).option("mockBars", 100000)
      .option("slices", 4).option("pageSize", 100)
      .option("mockFailEvery", 2) // every 2nd page: transient fault, then OK
      .load()
    assert(read.count() == 720)
  }

  test("cursor resume continues from max(ts)+1 with no re-ingested rows") {
    def readFrom(startMs: Long) = spark.read.format(fmt)
      .option("symbols", "BTCUSDT")
      .option("startMs", startMs).option("endMs", 6 * hour)
      .option("intervalMs", 60000L).option("mockBars", 100000)
      .load()
    val firstHalf = readFrom(0L).filter(col("ts") < lit("1970-01-01 03:00:00").cast("timestamp"))
    val resumeMs = KlineSource.resumeStartMs(firstHalf)
    assert(resumeMs == (3 * hour - 60000L) + 1L) // last candle 02:59 + 1ms
    val rest = readFrom(resumeMs)
    assert(rest.count() == 180) // 03:00..05:59 only — nothing re-ingested
    assert(firstHalf.count() + rest.count() == readFrom(0L).count())
    // empty lake -> resume from genesis
    assert(KlineSource.resumeStartMs(firstHalf.filter(lit(false))) == 0L)
  }

  test("connector edge cases: empty range rejected, out-of-grid reads empty") {
    intercept[Exception] {
      spark.read.format(fmt)
        .option("symbols", "BTCUSDT")
        .option("startMs", hour).option("endMs", hour) // empty [x, x)
        .load().count()
    }
    // start beyond the venue's grid: zero rows, not an error
    val n = spark.read.format(fmt)
      .option("symbols", "BTCUSDT")
      .option("startMs", 500 * hour).option("endMs", 501 * hour)
      .option("intervalMs", 60000L).option("mockBars", 100)
      .load().count()
    assert(n == 0)
  }

  test("connector output drives the clean chain end-to-end") {
    val bars = spark.read.format(fmt)
      .option("symbols", "BTCUSDT,ETHUSDT")
      .option("startMs", 0L).option("endMs", 6 * hour)
      .option("intervalMs", 60000L).option("mockBars", 100000)
      .load()
    val cleaned = graft.api.FinData.validateAndClean(bars)
    assert(cleaned.count() == 2 * 360)
    assert(cleaned.columns.contains("hour")) // time features appended
    val bad = cleaned.filter(col("high") < col("low") ||
      col("high") < col("open") || col("high") < col("close")).count()
    assert(bad == 0)
  }
}
