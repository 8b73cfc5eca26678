package graft.sources.connector

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1/S2 — exchange kline history as a DataSource V2 table (reference
  * `download_complete_history`, bybit_downloader.py:82-146): the reference's
  * driver-side while-loop becomes per-partition cursor pagination on
  * executors, so a backfill parallelizes over symbols × time slices instead
  * of one sequential HTTP session.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.connector.KlineSource")
  *     .option("symbols", "BTCUSDT,ETHUSDT")
  *     .option("startMs", 0).option("endMs", 86400000)
  *     .option("intervalMs", 60000)       // candle spacing
  *     .option("slices", 8)               // time slices per symbol
  *     .load()
  * }}}
  *
  * Scale design:
  *   - one InputPartition per (symbol, time slice): the unit of retry and
  *     of parallelism; 1000 symbols × 1 y of minutes spreads over any
  *     executor count with no driver bottleneck and no shuffle (ingestion
  *     is map-only; the lake write's partitionBy is the only exchange);
  *   - the cursor protocol is the reference's: fetch from `cursor`, advance
  *     to the last candle's ts, stop on empty page / no progress / past
  *     slice end. Exchanges re-serve the cursor candle (inclusive start) —
  *     the reader drops rows <= the previous cursor, so re-reads and
  *     overlaps are idempotent (§2.8 dedup-on-replay at the source);
  *   - retries/backoff/rate-limit waits happen inside the partition via
  *     [[ResilientTransport]], so a flaky page costs one partition, not
  *     the job.
  *
  * The offline container ships [[MockTransport]] only (option
  * `transport=mock`, the default); a production HTTP transport registers
  * itself in [[KlineSource.transports]] under a new name — the source is
  * transport-agnostic.
  */
class KlineSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KlineSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KlineTable(properties.asScala.toMap.map { case (k, v) => (k.toLowerCase, v) })
}

object KlineSource {
  val schema: StructType = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", DoubleType, nullable = false),
    StructField("turnover", DoubleType, nullable = false)))

  /** Transport registry: name → factory from the reader options. Factories
    * run on EXECUTORS (options are just strings), so entries must be pure.
    */
  val transports: Map[String, Map[String, String] => KlineTransport] = Map(
    "mock" -> { opts =>
      new MockTransport(
        // the exchange's candle grid is a property of the (mock) venue,
        // NOT of the query — a resumed read must see the same grid
        gridStartMs = opts.getOrElse("mockgridstartms", "0").toLong,
        intervalMs = opts.getOrElse("intervalms", "60000").toLong,
        bars = opts.getOrElse("mockbars", "10000").toInt,
        failFirstAttemptEvery = opts.getOrElse("mockfailevery", "0").toInt,
        rateLimitOnce = opts.get("mockratelimitat").map(_.toLong))
    })

  /** §2.8 incremental cursor resume: continue a backfill from just past
    * the newest row already in `existing` (reference
    * `get_latest_timestamp` → resume, timeseries_db.py:313-347).
    */
  def resumeStartMs(existing: DataFrame, tsCol: String = "ts"): Long = {
    import org.apache.spark.sql.functions._
    val r = existing.agg(max(unix_millis(col(tsCol).cast("timestamp")))).collect().head
    if (r.isNullAt(0)) 0L else r.getLong(0) + 1L
  }
}

private[connector] class KlineTable(options: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "klines"
  override def schema(): StructType = KlineSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new KlineScanBuilder(options ++
      caseInsensitiveOptions.asScala.map { case (k, v) => (k.toLowerCase, v) })
}

private[connector] class KlineScanBuilder(options: Map[String, String])
    extends ScanBuilder with Scan with Batch {

  private val symbols = options.getOrElse("symbols", "BTCUSDT").split(",").toSeq
  private val startMs = options.getOrElse("startms", "0").toLong
  private val endMs = options("endms").toLong
  private val slices = options.getOrElse("slices", "4").toInt
  private val pageSize = options.getOrElse("pagesize", "1000").toInt

  override def build(): Scan = this
  override def readSchema(): StructType = KlineSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"klines(${symbols.mkString(",")}, [$startMs,$endMs), $slices slices)"

  override def planInputPartitions(): Array[InputPartition] = {
    require(endMs > startMs, s"empty range [$startMs, $endMs)")
    val span = endMs - startMs
    val width = math.max(1L, (span + slices - 1) / slices)
    (for {
      sym <- symbols
      k <- 0L until slices.toLong
      lo = startMs + k * width
      if lo < endMs
    } yield KlinePartition(sym, lo, math.min(lo + width, endMs)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KlineReaderFactory(options)
}

private[connector] case class KlinePartition(symbol: String, fromMs: Long,
    untilMs: Long) extends InputPartition

private[connector] class KlineReaderFactory(options: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KlinePartition]
    val base = KlineSource.transports(options.getOrElse("transport", "mock"))(options)
    val transport = new ResilientTransport(base,
      maxRetries = options.getOrElse("maxretries", "3").toInt,
      retryDelayMs = options.getOrElse("retrydelayms", "1000").toLong)
    new KlineReader(p, transport, options.getOrElse("pagesize", "1000").toInt)
  }
}

/** The reference's pagination loop (bybit_downloader.py:108-124), one
  * partition's slice: fetch from cursor, emit rows in [fromMs, untilMs)
  * newer than the cursor, advance to the last ts, stop on empty page, no
  * progress, or slice end. Rows at/before the cursor are dropped —
  * overlapping pages and replays are idempotent.
  */
private[connector] class KlineReader(p: KlinePartition,
    transport: KlineTransport, pageSize: Int)
    extends PartitionReader[InternalRow] {

  private var cursor = p.fromMs - 1 // strictly-greater filter; first page inclusive of fromMs
  private var page: Iterator[Transport.Kline] = Iterator.empty
  private var done = false
  private var current: Transport.Kline = _

  private def fetchNextPage(): Unit = {
    val rows = transport.fetch(p.symbol, math.max(cursor, p.fromMs), pageSize)
    val fresh = rows.filter(k => k.tsMs > cursor && k.tsMs < p.untilMs)
    if (rows.isEmpty || rows.last.tsMs <= cursor) done = true // no progress
    else {
      cursor = rows.last.tsMs
      if (rows.last.tsMs >= p.untilMs && fresh.isEmpty) done = true
      page = fresh.iterator
    }
  }

  override def next(): Boolean = {
    while (!page.hasNext && !done) fetchNextPage()
    if (page.hasNext) { current = page.next(); true } else false
  }

  override def get(): InternalRow = {
    val r = new GenericInternalRow(8)
    r.setLong(0, current.tsMs * 1000L) // epoch micros
    r.update(1, UTF8String.fromString(p.symbol))
    r.setDouble(2, current.open)
    r.setDouble(3, current.high)
    r.setDouble(4, current.low)
    r.setDouble(5, current.close)
    r.setDouble(6, current.volume)
    r.setDouble(7, current.turnover)
    r
  }

  override def close(): Unit = ()
}
