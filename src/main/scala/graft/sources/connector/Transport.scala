package graft.sources.connector

/** Transport layer for the exchange kline connectors (SURVEY §2.1 S1/S2/S4
  * — reference bybit_downloader.py:42-80, binance_provider.py:36-95, and
  * the resilient HTTP wrapper data_cleaner.py:401-531).
  *
  * The container has no network, so the HTTP client itself is out of
  * scope; everything around it — the page/cursor protocol, retry with
  * exponential backoff, rate-limit waits, error accounting — is real and
  * unit-tested. A production transport implements [[KlineTransport]] over
  * HTTP; [[MockTransport]] is the deterministic offline stand-in the specs
  * and the DSv2 source drive end-to-end.
  */
object Transport {

  /** One candle as the exchange returns it (epoch-ms timestamp; reference
    * kline columns bybit_downloader.py:127-137).
    */
  case class Kline(tsMs: Long, open: Double, high: Double, low: Double,
      close: Double, volume: Double, turnover: Double)

  /** Transient network fault — retryable (reference ConnectionError /
    * Timeout branch, data_cleaner.py:509-524).
    */
  final class TransientError(msg: String) extends RuntimeException(msg)

  /** HTTP 429 with a Retry-After hint (data_cleaner.py:497-505). */
  final class RateLimitError(val retryAfterMs: Long)
    extends RuntimeException(s"rate limited, retry after ${retryAfterMs}ms")
}

/** A paged kline fetch: up to `limit` candles with ts >= startMs, ascending.
  * An empty result means no more data (reference's `if not candles: break`).
  */
trait KlineTransport extends Serializable {
  def fetch(symbol: String, startMs: Long, limit: Int): Seq[Transport.Kline]
}

/** Retry/backoff wrapper (reference `ResilientDataSource.get_data_with_retry`,
  * data_cleaner.py:477-531): up to `maxRetries` attempts; transient errors
  * back off exponentially (delay·2^attempt); rate limits sleep the server's
  * Retry-After. The sleeper is injected so specs assert the exact waits
  * without wall-clock time.
  */
class ResilientTransport(inner: KlineTransport, maxRetries: Int = 3,
    retryDelayMs: Long = 1000L,
    sleeper: Long => Unit = Thread.sleep) extends KlineTransport {

  import Transport._

  @transient private var errors0: scala.collection.mutable.Map[String, Int] = _
  private def errors = {
    if (errors0 == null) errors0 = scala.collection.mutable.Map.empty
    errors0
  }
  /** Error accounting (reference error_stats, data_cleaner.py:452-462). */
  def errorStats: Map[String, Int] = errors.toMap

  override def fetch(symbol: String, startMs: Long, limit: Int): Seq[Kline] = {
    var attempt = 0
    while (true) {
      try {
        return inner.fetch(symbol, startMs, limit)
      } catch {
        case e: RateLimitError =>
          errors("rate_limit_hits") = errors.getOrElse("rate_limit_hits", 0) + 1
          if (attempt == maxRetries - 1) throw e
          sleeper(e.retryAfterMs)
          attempt += 1
        case e: TransientError =>
          errors("network_errors") = errors.getOrElse("network_errors", 0) + 1
          if (attempt == maxRetries - 1) throw e
          sleeper(retryDelayMs * (1L << attempt)) // 1s, 2s, 4s, ...
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Deterministic offline exchange: a fixed candle grid per symbol, values a
  * pure function of (symbol, ts) — identical on every executor and every
  * run, at any parallelism. Pages mimic the exchanges' inclusive-start
  * cursor: a follow-up fetch from the last returned ts re-serves that
  * candle (the overlap the reference absorbs downstream via dedup —
  * bybit_downloader.py:116-124).
  *
  * Fault injection (both deterministic, keyed on the page's start cursor):
  *   - failFirstAttemptEvery = n: every n-th page throws TransientError on
  *     its first attempt (succeeds on retry);
  *   - rateLimitOnce = Some(startMs): that page 429s on first attempt.
  */
class MockTransport(gridStartMs: Long, intervalMs: Long, bars: Int,
    failFirstAttemptEvery: Int = 0, rateLimitOnce: Option[Long] = None,
    retryAfterMs: Long = 250L) extends KlineTransport {

  import Transport._

  @transient private var seen0: scala.collection.mutable.Set[(String, Long)] = _
  private def seen = {
    if (seen0 == null) seen0 = scala.collection.mutable.Set.empty
    seen0
  }

  /** Pure candle function — stable across JVMs (String.hashCode is
    * spec-fixed), so connector output is reproducible like
    * [[graft.sources.Generator]].
    */
  def candle(symbol: String, tsMs: Long): Kline = {
    val h = java.lang.Long.rotateLeft(tsMs * 0x9E3779B97F4A7C15L, 17) ^
      symbol.hashCode.toLong
    def u(shift: Int): Double = ((h >>> shift) & 0x3FF) / 1023.0 // [0,1]
    val base = 100.0 + (math.abs(symbol.hashCode) % 400)
    val o = base * (0.95 + 0.1 * u(0))
    val c = base * (0.95 + 0.1 * u(10))
    Kline(tsMs, o, math.max(o, c) * (1.0 + 0.01 * u(20)),
      math.min(o, c) * (1.0 - 0.01 * u(30)), c,
      1000.0 * u(40), 1000.0 * u(40) * (o + c) / 2)
  }

  private def pageIndex(startMs: Long): Long =
    math.max(0L, (startMs - gridStartMs) / intervalMs)

  override def fetch(symbol: String, startMs: Long, limit: Int): Seq[Kline] = {
    val firstAttempt = seen.add((symbol, startMs))
    if (firstAttempt && rateLimitOnce.contains(startMs))
      throw new RateLimitError(retryAfterMs)
    if (firstAttempt && failFirstAttemptEvery > 0 &&
      pageIndex(startMs) % failFirstAttemptEvery == 0)
      throw new TransientError(s"injected fault at $symbol/$startMs")
    val gridEnd = gridStartMs + intervalMs * (bars - 1)
    if (startMs > gridEnd) return Nil
    // ceil-align to the grid; a start exactly on a candle re-serves it
    val from = if (startMs <= gridStartMs) gridStartMs
      else gridStartMs + ((startMs - gridStartMs + intervalMs - 1) / intervalMs) * intervalMs
    Iterator.iterate(from)(_ + intervalMs)
      .takeWhile(_ <= gridEnd).take(limit)
      .map(ts => candle(symbol, ts)).toSeq
  }
}
