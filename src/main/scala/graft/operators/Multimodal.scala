package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media payloads as
  * opaque `binary` columns with a typed metadata struct, plus the
  * decode / feature-extract / frame-sample stages.
  *
  * Two decode tiers:
  *   - [[decodeFeatures]] + [[Codec]]: the pluggable byte-level seam with
  *     a deterministic stub default ([[MediaDecoder]]) — kept because it
  *     runs on ANY payload and pins the batch discipline (m3 oracle).
  *   - [[decodeMedia]] + [[MediaCodec]]: REAL decoders, JVM-native with
  *     zero new dependencies — [[JvmMediaCodec]] reads PNG/BMP through
  *     `javax.imageio` and WAV through a RIFF chunk walk (validated
  *     against `javax.sound`'s parser in MultimodalSpec). The m4/m5
  *     oracles hash-check actual encode→decode round-trips: the
  *     generated media's pixel/sample values are closed-form in
  *     (id, position), so DuckDB replays the DECODED stats as pure
  *     integer arithmetic. JPEG (lossy) runs through the same image
  *     path, spec-gated with a quantization tolerance since lossy
  *     codecs have no closed-form oracle. Video remains out of
  *     container scope — it slots into the same [[MediaCodec]] seam.
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
        require(feats.size == batch.size,
          s"Codec contract violation: ${batch.size} payloads in, " +
            s"${feats.size} features out — positional alignment required")
        batch.iterator.zip(feats.iterator).map { case ((id, bytes, _, _, _), (mean, hist)) =>
          MediaFeatures(id, bytes.length.toLong, mean, hist)
        }
      }
    }(Encoders.product[MediaFeatures])
  }

  // --------------------------------------------------------------------
  // REAL decode path (VERDICT r4 item 2): JVM-native codecs, no new
  // dependencies — javax.imageio for PNG/BMP, RIFF/PCM parse (validated
  // against javax.sound's header reader) for WAV. Stats are INTEGER sums
  // so the DuckDB oracle can replay them bit-exactly from the generator
  // arithmetic: the oracle-gated queries (m4/m5) prove the real
  // encode→decode round-trip, not a stub.
  // --------------------------------------------------------------------

  /** Decoded-media stats row: integer sums, not float means, so every
    * field hash-matches a closed-form oracle. Image rows carry
    * width/height and per-channel sums; audio rows carry
    * rate/channels/frames and the PCM sample sum.
    */
  case class DecodedMedia(media_id: Long, kind: String, width: Int, height: Int,
      sample_rate: Int, n_channels: Int, n_samples: Long,
      sum_r: Long, sum_g: Long, sum_b: Long, sum_pcm: Long)

  /** The real-decode boundary: whole batches in, stats out — same batch
    * discipline as [[Codec]] (a JNI/subprocess decoder amortizes per
    * batch). CONTRACT: the output is positionally aligned 1:1 with the
    * input — a codec that cannot decode a payload must throw (or emit a
    * sentinel row), never skip it: [[decodeMedia]] zips positionally and
    * asserts the lengths match, because a silent skip would shift every
    * later stat onto the wrong media_id.
    */
  trait MediaCodec extends Serializable {
    def decodeBatch(batch: Seq[(String, Array[Byte])]): Seq[DecodedMedia]
  }

  /** JVM-native decoders. PNG/BMP via `javax.imageio` (headless-safe);
    * WAV via a RIFF chunk walk + 16-bit little-endian PCM fold. Every
    * stat is an exact integer so downstream hashing is
    * platform-independent.
    */
  object JvmMediaCodec extends MediaCodec {

    // ImageIO's default ImageInputStream cache is FILE-backed: every
    // decode/encode writes a temp cache file, so N concurrent codec tasks
    // contend on the disk instead of scaling (measured: m4 at local[8]
    // beat local[32]). The payloads here are in-memory byte arrays — the
    // memory-backed cache is strictly better and bit-identical.
    javax.imageio.ImageIO.setUseCache(false)

    private def decodeImage(bytes: Array[Byte]): DecodedMedia = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "imageio could not decode payload")
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff
          sg += (rgb >> 8) & 0xff
          sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      DecodedMedia(0L, "image", w, h, 0, 3, w.toLong * h, sr, sg, sb, 0L)
    }

    /** RIFF/WAVE: walk chunks to `fmt ` (rate, channels, bits) and
      * `data` (16-bit LE PCM), folding the signed sample sum. Chunk walk
      * rather than fixed offsets — real WAVs carry LIST/fact chunks
      * before data.
      */
    private def decodeWav(bytes: Array[Byte]): DecodedMedia = {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(bytes.length >= 44 && bb.getInt(0) == 0x46464952, "not RIFF") // "RIFF"
      require(bb.getInt(8) == 0x45564157, "not WAVE") // "WAVE"
      var pos = 12
      var rate = 0; var channels = 0; var bits = 0
      var nFrames = 0L; var sum = 0L
      while (pos + 8 <= bytes.length) {
        val id = bb.getInt(pos)
        val size = bb.getInt(pos + 4)
        // corrupt/truncated containers must FAIL the decode, not hang
        // the executor: a negative or out-of-bounds size would advance
        // pos by <= 0 (infinite loop) or overrun the sample fold
        require(size >= 0 && pos + 8 + size <= bytes.length,
          s"corrupt WAV: chunk size $size at offset $pos exceeds payload")
        if (id == 0x20746d66) { // "fmt "
          require(size >= 16, s"corrupt WAV: fmt chunk of $size bytes")
          channels = bb.getShort(pos + 10).toInt
          rate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22).toInt
        } else if (id == 0x61746164) { // "data"
          require(bits == 16, s"PCM16 expected, got $bits-bit")
          val nSamples = size / 2
          var i = 0
          while (i < nSamples) {
            sum += bb.getShort(pos + 8 + i * 2)
            i += 1
          }
          nFrames = nSamples.toLong / math.max(channels, 1)
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
      DecodedMedia(0L, "audio", 0, 0, rate, channels, nFrames, 0L, 0L, 0L, sum)
    }

    override def decodeBatch(batch: Seq[(String, Array[Byte])]): Seq[DecodedMedia] =
      batch.map {
        case (mime, bytes) if mime.startsWith("image/") => decodeImage(bytes)
        case (mime, bytes) if mime == "audio/wav" => decodeWav(bytes)
        case (mime, _) => throw new IllegalArgumentException(s"no codec for $mime")
      }
  }

  /** Real decode over the batched seam: per-partition iterator,
    * codec invoked once per batch, media bytes never shuffled — only the
    * fixed-width stats rows move.
    */
  def decodeMedia(media: DataFrame, batchSize: Int = 64,
      codec: MediaCodec = JvmMediaCodec): Dataset[DecodedMedia] = {
    val ds = media.select(col("media_id"), col("bytes"), col("meta.mime"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY, Encoders.STRING))
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val stats = codec.decodeBatch(batch.map { case (_, bytes, mime) =>
          (mime, bytes) })
        require(stats.size == batch.size,
          s"MediaCodec contract violation: ${batch.size} payloads in, " +
            s"${stats.size} stats out — a skipped row would shift every " +
            "later stat onto the wrong media_id")
        batch.iterator.zip(stats.iterator).map { case ((id, _, _), s) =>
          s.copy(media_id = id)
        }
      }
    }(Encoders.product[DecodedMedia])
  }

  /** Deterministic REAL media generators for the m4/m5 oracles: the
    * pixel/sample values are closed-form functions of (id, position), so
    * the DECODED stats are replayable as pure SQL arithmetic — the
    * oracle checks the actual encode→decode round-trip. PNG and BMP
    * alternate by id (two real containers through one decode path);
    * both are lossless 24-bit RGB, so the decoded channel sums equal
    * the generator formulas exactly.
    */
  object MediaGen {
    def dims(id: Long): (Int, Int) = ((id % 24 + 4).toInt, (id % 16 + 4).toInt)

    /** The shared gradient raster — the closed-form contract the m4
      * oracle SQL and MultimodalSpec mirror; PNG/BMP (lossless,
      * oracle-gated) and JPEG (lossy, tolerance-gated) all encode THIS,
      * so the formulas cannot desynchronize between tiers.
      */
    private def gradientImage(id: Long): java.awt.image.BufferedImage = {
      val (w, h) = dims(id)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((id + x + y) % 256).toInt
          val g = ((id + 2 * x + y) % 256).toInt
          val b = ((id + x + 2 * y) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      img
    }

    // same file-backed-cache trap as JvmMediaCodec (see its note): the
    // encode side writes to in-memory streams, so disable the temp-file
    // ImageOutputStream cache here too — MediaGen can load on an executor
    // before JvmMediaCodec does
    javax.imageio.ImageIO.setUseCache(false)

    private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }

    def pngOrBmp(id: Long): (String, Array[Byte]) =
      if (id % 2 == 0) ("image/png", encode(gradientImage(id), "png"))
      else ("image/bmp", encode(gradientImage(id), "bmp"))

    /** JPEG variant of the same gradient — LOSSY, so it exercises
      * [[JvmMediaCodec]]'s image path on a real-world compressed
      * container but is spec-gated with a tolerance (MultimodalSpec)
      * rather than oracle-gated: decoded dims/pixel-count are exact,
      * channel sums approximate the generator formula within the
      * codec's quantization error.
      */
    def jpeg(id: Long): (String, Array[Byte]) =
      ("image/jpeg", encode(gradientImage(id), "jpg"))

    def wavSamples(id: Long): Int = (id % 100 + 50).toInt
    def wavRate(id: Long): Int = (8000 + (id % 8) * 1000).toInt

    /** Mono PCM16LE WAV; sample i = ((id·31 + i·7) mod 65536) − 32768. */
    def wav(id: Long): (String, Array[Byte]) = {
      val n = wavSamples(id)
      val rate = wavRate(id)
      val dataLen = n * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(0x46464952).putInt(36 + dataLen).putInt(0x45564157) // RIFF size WAVE
      bb.putInt(0x20746d66).putInt(16) // fmt , 16 bytes
        .putShort(1).putShort(1) // PCM, mono
        .putInt(rate).putInt(rate * 2) // byte rate = rate * block align
        .putShort(2).putShort(16) // block align, bits
      bb.putInt(0x61746164).putInt(dataLen) // data
      var i = 0
      while (i < n) {
        bb.putShort((((id * 31 + i * 7) % 65536) - 32768).toShort)
        i += 1
      }
      ("audio/wav", bb.array())
    }
  }

  /** Spread the id rows over the cluster BEFORE generating payloads: ids
    * are a handful of bytes each (shuffling them is ~free at any scale),
    * while the per-id encode work is heavy — generating after the spread
    * is the "move small rows, create heavy bytes once, in place" shape.
    * Without it the parallelism is whatever the id SOURCE's partitioning
    * happens to be (a single-row-group parquet file = ONE task encoding
    * and decoding the entire set; measured: m4 ran 1-way at local[32],
    * wall flat from 32 cores down to 8).
    */
  private def spread(ids: DataFrame): Dataset[Long] =
    ids.select(col("media_id")).as(Encoders.scalaLong)
      .repartition(ids.sparkSession.sparkContext.defaultParallelism)

  /** The generated-media tables as DataFrames (map-only fixture
    * generation — bytes are born on executors, never shuffled).
    */
  def syntheticImages(ids: DataFrame): DataFrame =
    spread(ids).map { id =>
      val (mime, bytes) = MediaGen.pngOrBmp(id)
      MediaRow(id, bytes, MediaMeta(mime, MediaGen.dims(id)._1, MediaGen.dims(id)._2))
    }(Encoders.product[MediaRow]).toDF()

  def syntheticWavs(ids: DataFrame): DataFrame =
    spread(ids).map { id =>
      val (mime, bytes) = MediaGen.wav(id)
      MediaRow(id, bytes, MediaMeta(mime, 0, 0))
    }(Encoders.product[MediaRow]).toDF()
}
