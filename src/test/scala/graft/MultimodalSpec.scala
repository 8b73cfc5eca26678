package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world", "en", "s", 11L),
    (2L, "abc", "en", "s", 3L),
    (3L, "", "en", "s", 0L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("media table has binary payload + typed metadata") {
    val m = Multimodal.toMediaTable(docs)
    val r = m.filter(col("media_id") === 1L).collect().head
    assert(r.getAs[Array[Byte]]("bytes").toSeq == "hello world".getBytes("UTF-8").toSeq)
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getString(0) == "text/plain")
    assert(meta.getInt(1) == 12 && meta.getInt(2) == 12) // 11 % 640 + 1
  }

  test("frame sampling takes every Nth byte; short payloads yield empty") {
    val m = Multimodal.toMediaTable(docs)
    val f = m.select(col("media_id"), Multimodal.sampleFrames(col("bytes"), 4).as("fr"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // "hello world": bytes h,e,l,l,o,' ',w,o,r,l,d -> positions 1,5 -> 'h','o'
    assert(f(1L) == Seq('h'.toLong, 'o'.toLong))
    assert(f(2L) == Seq.empty) // 3 bytes < stride 4
    assert(f(3L) == Seq.empty)
  }

  test("decode stub: batched features match direct computation") {
    val m = Multimodal.toMediaTable(docs)
    val feats = Multimodal.decodeFeatures(m, batchSize = 2).collect()
      .map(f => f.media_id -> f).toMap
    val bytes = "hello world".getBytes("UTF-8")
    assert(feats(1L).n_bytes == 11L)
    assert(feats(1L).mean_byte == bytes.map(_ & 0xff).sum.toDouble / 11)
    assert(feats(1L).byte_hist.sum == 11L)
    assert(feats(3L).n_bytes == 0L && feats(3L).mean_byte == 0.0)
  }

  test("codec seam: an injected codec replaces the stub, sees whole batches") {
    // a fake "real" decoder: features derived from mime + payload length,
    // and every invocation records its batch size via the returned hist
    class FakeCodec extends Multimodal.Codec {
      override def decodeBatch(batch: Seq[(String, Array[Byte])]): Seq[(Double, Array[Long])] =
        batch.map { case (mime, bytes) =>
          (mime.length.toDouble * 1000 + bytes.length,
            Array(batch.length.toLong)) // smuggle out the observed batch size
        }
    }
    val m = Multimodal.toMediaTable(docs).repartition(1)
    val feats = Multimodal.decodeFeatures(m, batchSize = 2, codec = new FakeCodec)
      .collect().map(f => f.media_id -> f).toMap
    // the injected codec's features came through, not the stub's
    assert(feats(1L).mean_byte == "text/plain".length * 1000 + 11.0)
    // batches were real batches: with 1 partition and batchSize=2, no
    // codec call saw more than 2 rows, and at least one saw exactly 2
    val batchSizes = feats.values.map(_.byte_hist.head).toSeq
    assert(batchSizes.forall(_ <= 2L))
    assert(batchSizes.contains(2L))
    // the default path still runs the deterministic stub unchanged
    val stub = Multimodal.decodeFeatures(m, batchSize = 2).collect()
      .map(f => f.media_id -> f).toMap
    assert(stub(1L).n_bytes == 11L && stub(1L).byte_hist.sum == 11L)
  }

  test("real codec: PNG and BMP containers decode to the generator's closed-form stats") {
    val ids = (0L to 49L).toDF("media_id")
    val decoded = Multimodal.decodeMedia(
        Multimodal.syntheticImages(ids), batchSize = 8)
      .collect().map(d => d.media_id -> d).toMap
    assert(decoded.size == 50)
    for (id <- 0L to 49L) {
      val (w, h) = Multimodal.MediaGen.dims(id)
      val d = decoded(id)
      assert(d.kind == "image" && d.width == w && d.height == h)
      assert(d.n_samples == w.toLong * h)
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        er += (id + x + y) % 256
        eg += (id + 2 * x + y) % 256
        eb += (id + x + 2 * y) % 256
      }
      assert(d.sum_r == er && d.sum_g == eg && d.sum_b == eb,
        s"id=$id: got (${d.sum_r},${d.sum_g},${d.sum_b}) want ($er,$eg,$eb)")
    }
    // PNG (even ids) and BMP (odd ids) are genuinely different containers
    val even = Multimodal.MediaGen.pngOrBmp(2L)
    val odd = Multimodal.MediaGen.pngOrBmp(3L)
    assert(even._1 == "image/png" &&
      (even._2.take(8).map(_ & 0xff) sameElements
        Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)))
    assert(odd._1 == "image/bmp" && odd._2(0) == 'B'.toByte && odd._2(1) == 'M'.toByte)
  }

  test("real codec: JPEG (lossy) decodes with exact dims and near-formula channel stats") {
    val ids = (0L to 19L).toDF("media_id")
    val jpegs = ids.as[Long].map { id =>
      val (mime, bytes) = Multimodal.MediaGen.jpeg(id)
      Multimodal.MediaRow(id, bytes, Multimodal.MediaMeta(mime,
        Multimodal.MediaGen.dims(id)._1, Multimodal.MediaGen.dims(id)._2))
    }.toDF()
    val decoded = Multimodal.decodeMedia(jpegs, batchSize = 4)
      .collect().map(d => d.media_id -> d).toMap
    for (id <- 0L to 19L) {
      val (w, h) = Multimodal.MediaGen.dims(id)
      val d = decoded(id)
      // container metadata is exact even under lossy compression
      assert(d.width == w && d.height == h && d.n_samples == w.toLong * h)
      // channel sums approximate the generator formula: JPEG quantization
      // error is bounded; mean per-pixel-channel error well under 48/255
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        er += (id + x + y) % 256
        eg += (id + 2 * x + y) % 256
        eb += (id + x + 2 * y) % 256
      }
      val n = (w * h).toDouble
      assert(math.abs(d.sum_r - er) / n < 48 && math.abs(d.sum_g - eg) / n < 48 &&
        math.abs(d.sum_b - eb) / n < 48,
        s"id=$id: got (${d.sum_r},${d.sum_g},${d.sum_b}) want ~($er,$eg,$eb)")
    }
    // it is really a JPEG container (SOI marker)
    val bytes = Multimodal.MediaGen.jpeg(4L)._2
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
  }

  test("real codec: WAV RIFF walk matches javax.sound's header parse and the PCM formula") {
    val ids = (0L to 29L).toDF("media_id")
    val decoded = Multimodal.decodeMedia(
        Multimodal.syntheticWavs(ids), batchSize = 8)
      .collect().map(d => d.media_id -> d).toMap
    for (id <- 0L to 29L) {
      val d = decoded(id)
      val n = Multimodal.MediaGen.wavSamples(id)
      assert(d.kind == "audio" && d.n_channels == 1)
      assert(d.sample_rate == Multimodal.MediaGen.wavRate(id))
      assert(d.n_samples == n.toLong)
      val want = (0 until n).map(i => ((id * 31 + i * 7) % 65536) - 32768).sum
      assert(d.sum_pcm == want, s"id=$id: got ${d.sum_pcm} want $want")
      // cross-check the header against the JDK's own WAV parser
      val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(Multimodal.MediaGen.wav(id)._2))
      assert(fmt.getFormat.getSampleRate.toInt == d.sample_rate)
      assert(fmt.getFormat.getChannels == d.n_channels)
      assert(fmt.getFormat.getSampleSizeInBits == 16)
      assert(fmt.getFrameLength == d.n_samples)
    }
  }

  test("resize clamps metadata dims and preserves mime") {
    val m = Multimodal.resizeMeta(Multimodal.toMediaTable(docs), 8, 8)
    val meta = m.filter(col("media_id") === 1L)
      .select(col("meta.mime"), col("meta.width"), col("meta.height"))
      .collect().head
    assert(meta.getString(0) == "text/plain" && meta.getInt(1) == 8 && meta.getInt(2) == 8)
  }
}
