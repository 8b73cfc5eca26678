package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Resample

/** Reference invariants from tests/units/test_processing.py:148-166
  * (SURVEY §5): OHLC bounds on resampled output, monotone row counts
  * across coarser frames, gap-fill semantics.
  */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  // 2 symbols, 1-minute bars with a 3-hour hole in the middle of symbol A
  private lazy val bars = {
    val rows = for {
      sym <- Seq("A", "B")
      i <- 0 until 600
      if !(sym == "A" && i >= 200 && i < 380)
    } yield {
      val base = if (sym == "A") 100.0 else 50.0
      val o = base + (i % 17) * 0.3
      val c = base + ((i + 5) % 13) * 0.4
      (Timestamp.valueOf(f"2024-03-01 ${i / 60}%02d:${i % 60}%02d:00"),
        sym, o, math.max(o, c) + 0.1, math.min(o, c) - 0.1, c, 10.0 + (i % 7))
    }
    rows.toDF("ts", "symbol", "open", "high", "low", "close", "volume")
  }

  test("hourly buckets satisfy OHLC invariants and conserve volume") {
    val h = Resample.ohlcv(bars, "1 hour")
    val rows = h.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, hi, lo, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(hi >= lo && hi >= o && hi >= c && lo <= o && lo <= c)
    }
    val totalIn = bars.agg(sum("volume")).as[Double].head()
    val totalOut = h.agg(sum("volume")).as[Double].head()
    assert(math.abs(totalIn - totalOut) < 1e-6)
  }

  test("row counts decrease monotonically across coarser frames") {
    val counts = Seq("5 minutes", "15 minutes", "1 hour", "4 hours")
      .map(f => Resample.ohlcv(bars, f).count())
    assert(counts == counts.sorted.reverse)
  }

  test("open/close pick earliest/latest row in each bucket") {
    val h = Resample.ohlcv(bars, "1 hour")
      .filter($"symbol" === "A" && $"bucket_ts" === Timestamp.valueOf("2024-03-01 00:00:00"))
      .select("open", "close").as[(Double, Double)].head()
    // minute 0: open = 100 + 0*0.3; minute 59: close = 100 + (64 % 13)*0.4
    assert(h._1 == 100.0)
    assert(h._2 == 100.0 + ((59 + 5) % 13) * 0.4)
  }

  test("gap-fill materializes empty buckets with ffilled OHLC and zero volume") {
    val hourly = Resample.ohlcv(bars, "1 hour")
    val filled = Resample.fillGaps(hourly, "1 hour")
    val a = filled.filter($"symbol" === "A").orderBy("bucket_ts").collect()
    assert(a.length == 10) // 00:00..09:59 continuous calendar
    val holes = a.filter(_.getAs[Long]("n_bars") == 0L)
    assert(holes.length == 2) // hole spans minutes [200,380) → hours 4,5 empty
    holes.foreach { r =>
      assert(r.getAs[Double]("volume") == 0.0)
      assert(!r.isNullAt(r.fieldIndex("close"))) // ffilled from prior bucket
    }
    // no gaps for symbol B
    assert(filled.filter($"symbol" === "B" && $"n_bars" === 0L).count() == 0)
  }

  test("3d buckets anchor to each symbol's start day, not the epoch") {
    // symbol C starts 2024-03-02 (not a multiple of 3 days since epoch:
    // epoch-aligned 3-day windows would bucket at 2024-02-29/03-03)
    val c = bars.filter($"symbol" === "B")
      .withColumn("ts", $"ts" + expr("INTERVAL 1 DAY"))
      .withColumn("symbol", lit("C"))
    val out = Resample.ohlcvAnchored(bars.unionByName(c), "3 days").collect()
    val byS = out.groupBy(_.getAs[String]("symbol"))
    def ldt(s: String) = Timestamp.valueOf(s).toLocalDateTime
    assert(byS("A").map(_.getAs[java.time.LocalDateTime]("bucket_ts")).toSet ==
      Set(ldt("2024-03-01 00:00:00")))
    assert(byS("C").map(_.getAs[java.time.LocalDateTime]("bucket_ts")).toSet ==
      Set(ldt("2024-03-02 00:00:00"))) // own origin, same data
  }

  test("1w buckets bin ISO weeks and label their Sunday (pandas W-SUN)") {
    // 2024-03-01 is a Friday; its ISO week is Mon 02-26 .. Sun 03-03
    val w = Resample.ohlcvWeekly(bars).collect()
    assert(w.map(_.getAs[Timestamp]("bucket_ts")).toSet ==
      Set(Timestamp.valueOf("2024-03-03 00:00:00")))
    // volume conserved into the single weekly bucket
    val tot = bars.filter($"symbol" === "A").agg(sum("volume")).head.getDouble(0)
    val wA = w.find(_.getAs[String]("symbol") == "A").get
    assert(math.abs(wA.getAs[Double]("volume") - tot) < 1e-6)
  }

  test("8h frame resamples via the dispatcher (reference VALID_TIMEFRAMES)") {
    val r = Resample.resample(bars, "8h").collect()
    // 10 hours of data per symbol → 2 buckets each (00:00, 08:00)
    assert(r.length == 4)
    assert(r.map(_.getAs[Timestamp]("bucket_ts")).toSet ==
      Set(Timestamp.valueOf("2024-03-01 00:00:00"),
        Timestamp.valueOf("2024-03-01 08:00:00")))
  }

  test("multiFrame fan-out includes the calendar-month frame") {
    val m = Resample.multiFrame(bars, Seq("5m", "1h", "1M"))
    assert(m.keySet == Set("5m", "1h", "1M"))
    assert(m("1M").count() == 2) // one month bucket per symbol
  }
}
