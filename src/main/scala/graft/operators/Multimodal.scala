package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media payloads as
  * opaque `binary` columns with a typed metadata struct, plus the
  * decode / feature-extract / frame-sample stages.
  *
  * The Spark-side plumbing — schema, batched partition iteration, sampling
  * expressions, partitioning behavior — is real and tested. The actual
  * image/audio DECODE is stubbed ([[decodeFeatures]]): the codec libraries
  * are not in this container, so the stub computes deterministic
  * byte-level "features" with the exact iterator/batch shape a JNI or
  * subprocess decoder would use. Swap [[MediaDecoder.decode]] for a real
  * codec to productionize.
  *
  * Scale notes: media bytes never pass through a shuffle here — decode and
  * sampling are map-only over the scan; only the (small) extracted features
  * move. That is the property that matters at 100 TB of media.
  */
object Multimodal {

  /** Typed per-media metadata (mirrors a real pipeline's probe output). */
  case class MediaMeta(mime: String, width: Int, height: Int)

  case class MediaRow(media_id: Long, bytes: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(media_id: Long, n_bytes: Long, mean_byte: Double,
      byte_hist: Array[Long])

  /** Build a media table from the documents fixture: UTF-8 payload bytes +
    * deterministic metadata (a stand-in for image/audio blobs — the testdata
    * ships no real media; the column types and plumbing are the deliverable).
    */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        lit("text/plain").as("mime"),
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        (col("n_chars") % 480 + 1).cast("int").as("height")).as("meta"))

  /** Byte value (0-255) at 1-based `pos` of a binary column — expression
    * only, no UDF (hex → base-16 parse of the single byte).
    */
  def byteAt(bin: Column, pos: Column): Column =
    conv(hex(substring(bin, pos, lit(1))), 16, 10).cast("long")

  /** "Frame sampling": every `stride`-th byte of the payload (stand-in for
    * video frame extraction — same array-of-samples shape). Guarded against
    * Spark's descending `sequence(1, 0)` for short payloads.
    */
  def sampleFrames(bin: Column, stride: Int): Column = {
    val n = length(bin) // byte length for BinaryType
    when(n >= stride,
      transform(sequence(lit(1), (n / stride).cast("int")), i =>
        byteAt(bin, (i - lit(1)) * stride + lit(1))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** "Resize": metadata-only transform (a real resize rewrites bytes; the
    * metadata contract — clamped dims, preserved mime — is what downstream
    * stages consume).
    */
  def resizeMeta(df: DataFrame, maxW: Int, maxH: Int): DataFrame =
    df.withColumn("meta", struct(
      col("meta.mime").as("mime"),
      least(col("meta.width"), lit(maxW)).as("width"),
      least(col("meta.height"), lit(maxH)).as("height")))

  /** The decode boundary — the pluggable seam a real image/audio codec
    * drops into without touching the operator. Implementations must be
    * `Serializable` (the codec ships to executors inside the
    * mapPartitions closure) and are handed a WHOLE BATCH at a time, so a
    * JNI or subprocess decoder amortizes its native call per batch, not
    * per row (the mapInPandas batch-shape discipline).
    */
  trait Codec extends Serializable {
    /** Decode one batch of (mime, payload) into (mean, histogram) feature
      * pairs, positionally aligned with the input.
      */
    def decodeBatch(batch: Seq[(String, Array[Byte])]): Seq[(Double, Array[Long])]
  }

  /** Default codec — a deterministic byte-level STUB (the codec libraries
    * are not in this container): mean byte value + a 16-bin byte
    * histogram. Keeps the pipeline testable end-to-end with the identical
    * signature and batch shape a real decoder would use.
    */
  object MediaDecoder extends Codec {
    val HistBins = 16

    /** STUB: replace with a real image/audio decode. Deterministic
      * byte-level stand-in so the pipeline stays testable end-to-end.
      */
    def decode(bytes: Array[Byte]): (Double, Array[Long]) = {
      val hist = new Array[Long](HistBins)
      var sum = 0L
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        hist(b * HistBins / 256) += 1
        sum += b
        i += 1
      }
      (if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length, hist)
    }

    override def decodeBatch(batch: Seq[(String, Array[Byte])]): Seq[(Double, Array[Long])] =
      batch.map { case (_, bytes) => decode(bytes) }
  }

  /** Feature extraction over the decode boundary: batched per-partition
    * iteration (the mapInPandas analog in Scala — one iterator pass per
    * partition, codec invoked once per batch, only features emitted).
    * Inject a real [[Codec]] to productionize; the default is the
    * deterministic [[MediaDecoder]] stub.
    */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64,
      codec: Codec = MediaDecoder): Dataset[MediaFeatures] = {
    val ds = media.select(col("media_id"), col("bytes"), col("meta.mime"),
      col("meta.width"), col("meta.height"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY,
        Encoders.STRING, Encoders.scalaInt, Encoders.scalaInt))
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val feats = codec.decodeBatch(batch.map { case (_, bytes, mime, _, _) =>
          (mime, bytes)
        })
        batch.iterator.zip(feats.iterator).map { case ((id, bytes, _, _, _), (mean, hist)) =>
          MediaFeatures(id, bytes.length.toLong, mean, hist)
        }
      }
    }(Encoders.product[MediaFeatures])
  }
}
