package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming (§2.8 beyond the tumbling roll-up):
  * incremental per-symbol EMA via `flatMapGroupsWithState` — the streaming
  * twin of the batch Catalyst EMA window function. State per symbol is ONE
  * (lastTs, lastEma) pair regardless of stream length; each micro-batch's
  * rows are applied in event-time order and out-of-order stragglers older
  * than the carried state are dropped (the watermark upstream bounds how
  * late they can be).
  *
  * This is the `KeyValueGroupedDataset` escape hatch the engine reserves
  * for semantics no built-in streaming aggregate expresses — a recurrence
  * y_t = f(y_{t-1}, x_t) with per-row output.
  */
object StatefulIndicators {

  case class Tick(symbol: String, ts: Timestamp, close: Double)
  case class EmaTick(symbol: String, ts: Timestamp, close: Double, ema: Double)
  case class EmaState(lastTsMillis: Long, ema: Double)

  def streamingEma(ticks: Dataset[Tick], alpha: Double): Dataset[EmaTick] = {
    implicit val outEnc = Encoders.product[EmaTick]
    implicit val stateEnc = Encoders.product[EmaState]
    ticks
      .groupByKey(_.symbol)(Encoders.STRING)
      .flatMapGroupsWithState[EmaState, EmaTick](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (symbol: String, rows: Iterator[Tick], state: GroupState[EmaState]) =>
          val ordered = rows.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.getOrElse(EmaState(Long.MinValue, Double.NaN))
          val out = ordered.flatMap { t =>
            if (t.ts.getTime <= st.lastTsMillis) None // stale straggler
            else {
              val e =
                if (st.lastTsMillis == Long.MinValue) t.close
                else alpha * t.close + (1 - alpha) * st.ema
              st = EmaState(t.ts.getTime, e)
              Some(EmaTick(symbol, t.ts, t.close, e))
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
