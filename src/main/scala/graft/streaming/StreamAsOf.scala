package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment (§2.6's as-of join, live): attach to every
  * probe (trade/order) the latest quote at-or-before its event time, per
  * symbol — the low-latency twin of the batch [[graft.operators.AsOfJoin]]
  * (reference join semantics: pandas merge_asof backward).
  *
  * Spark's built-in stream-stream interval join cannot express "LATEST
  * at-or-before" (it emits EVERY quote in the interval, not the max-ts
  * one), so this is the documented `flatMapGroupsWithState` escape hatch:
  * quotes and probes ride ONE keyed stream; per-symbol state is the
  * quote buffer covering the lateness horizon — out-of-order probes
  * within the horizon still match their exact historical quote, and the
  * buffer prunes to `horizonMs` behind the newest quote so state stays
  * O(quotes-per-horizon), not O(stream).
  *
  * Ordering discipline: each micro-batch is applied in event-time order
  * with quotes before probes on ties (as-of matches equal timestamps).
  * Probes older than the pruned horizon emit unenriched (None) rather
  * than matching a too-new quote — the same honesty rule as the batch
  * join's tolerance option.
  */
object StreamAsOf {

  /** One event on the unioned stream: a quote (isQuote=true, price set)
    * or a probe (probeId set).
    */
  case class MarketEvent(symbol: String, ts: Timestamp, isQuote: Boolean,
      price: Double, probeId: Long)

  def quote(symbol: String, ts: Timestamp, price: Double): MarketEvent =
    MarketEvent(symbol, ts, isQuote = true, price, probeId = -1L)

  def probe(symbol: String, ts: Timestamp, probeId: Long): MarketEvent =
    MarketEvent(symbol, ts, isQuote = false, price = 0.0, probeId)

  case class Enriched(symbol: String, ts: Timestamp, probeId: Long,
      quoteTs: Option[Timestamp], quotePrice: Option[Double])

  /** (tsMillis, price) pairs sorted ascending; newest last. */
  case class QuoteBuffer(quotes: Vector[(Long, Double)])

  def enrichAsOf(events: Dataset[MarketEvent], horizonMs: Long): Dataset[Enriched] = {
    implicit val outEnc = Encoders.product[Enriched]
    implicit val stateEnc = Encoders.product[QuoteBuffer]
    events
      .groupByKey(_.symbol)(Encoders.STRING)
      .flatMapGroupsWithState[QuoteBuffer, Enriched](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (symbol: String, rows: Iterator[MarketEvent], state: GroupState[QuoteBuffer]) =>
          // event-time order; quotes first on ties so an equal-ts probe
          // sees the quote (merge_asof backward includes equal keys)
          val ordered = rows.toSeq.sortBy(e => (e.ts.getTime, !e.isQuote))
          var buf = state.getOption.getOrElse(QuoteBuffer(Vector.empty)).quotes
          val out = Vector.newBuilder[Enriched]
          ordered.foreach { e =>
            if (e.isQuote) {
              val t = e.ts.getTime
              // insert in ts order (out-of-order quotes within the batch
              // or across batches land in their historical slot)
              val at = buf.lastIndexWhere(_._1 <= t) + 1
              buf = (buf.take(at) :+ (t, e.price)) ++ buf.drop(at)
              val newest = buf.last._1
              buf = buf.dropWhile(_._1 < newest - horizonMs)
            } else {
              val t = e.ts.getTime
              val m = buf.lastIndexWhere(_._1 <= t) match {
                case -1 => None
                case i => Some(buf(i))
              }
              out += Enriched(symbol, e.ts, e.probeId,
                m.map(q => new Timestamp(q._1)), m.map(_._2))
            }
          }
          state.update(QuoteBuffer(buf))
          out.result().iterator
      }
  }
}
