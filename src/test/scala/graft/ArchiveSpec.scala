package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.Deflater

import org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream
import org.apache.commons.compress.compressors.xz.XZCompressorOutputStream

import graft.sources.{Archive, ConcatZlibInputStream}

/** Whole-file archive compatibility (reference data_compressor.py /
  * data_storage_manager.py:203-228): extension-dispatched zlib/xz/bz2
  * containers, including the reference's chunked framing — each 1 MiB chunk
  * compressed independently and the streams concatenated — which our readers
  * must accept even though the reference's own one-shot decompress cannot.
  */
class ArchiveSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-archive-$tag").toString

  /** Deterministic pseudo-text payload, larger than one compressor buffer. */
  private def payload(n: Int): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (sb.length < n) {
      sb.append(s"row-$i,BTCUSDT,${i * 31 % 997},${i * 17 % 101}\n")
      i += 1
    }
    sb.toString.getBytes("UTF-8")
  }

  /** The reference's exact write-side framing (data_compressor.py:80-86):
    * split into chunks, compress each independently, concatenate.
    */
  private def referenceFraming(data: Array[Byte], chunkSize: Int,
      method: Archive.Method): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    data.grouped(chunkSize).foreach { chunk =>
      method match {
        case Archive.Zlib =>
          val d = new Deflater(6)
          d.setInput(chunk); d.finish()
          val buf = new Array[Byte](chunk.length + 1024)
          while (!d.finished()) out.write(buf, 0, d.deflate(buf))
          d.end()
        case Archive.Lzma =>
          val xz = new XZCompressorOutputStream(out, 6)
          xz.write(chunk); xz.finish()
        case Archive.Bz2 =>
          // BZip2CompressorOutputStream closes the underlying stream on
          // close(), so compress to a side buffer per chunk.
          val side = new ByteArrayOutputStream()
          val bz = new BZip2CompressorOutputStream(side, 6)
          bz.write(chunk); bz.close()
          out.write(side.toByteArray)
      }
    }
    out.toByteArray
  }

  for (method <- Archive.methods) {
    test(s"${method.name}: single-file round trip via the Hadoop FS path") {
      val dir = tmpDir(method.name)
      val data = payload(300 * 1024)
      val src = s"$dir/bars.csv"
      Files.write(Paths.get(src), data)

      val stats = Archive.compressFile(spark, src, method = method)
      assert(stats.outputPath == src + method.extension)
      assert(stats.originalSize == data.length)
      assert(stats.compressedSize > 0 && stats.compressedSize < data.length)
      assert(stats.spaceSaved == stats.originalSize - stats.compressedSize)

      Files.delete(Paths.get(src))
      val back = Archive.decompressFile(spark, stats.outputPath)
      assert(back == src) // extension stripped, reference with_suffix("")
      assert(Files.readAllBytes(Paths.get(back)).sameElements(data))
    }

    test(s"${method.name}: reads the reference's chunked concatenated framing") {
      val dir = tmpDir(s"chunked-${method.name}")
      // 5 chunks of 64 KiB -> 5 independent streams back to back.
      val data = payload(5 * 64 * 1024)
      val archived = referenceFraming(data, 64 * 1024, method)
      val src = s"$dir/big.csv${method.extension}"
      Files.write(Paths.get(src), archived)

      val back = Archive.decompressFile(spark, src)
      assert(Files.readAllBytes(Paths.get(back)).sameElements(data),
        "concatenated member streams must all be decoded, not just the first")
    }
  }

  test("zlib: empty and single-member streams through ConcatZlibInputStream") {
    // empty underlying stream -> clean EOF
    val empty = new ConcatZlibInputStream(new java.io.ByteArrayInputStream(Array.emptyByteArray))
    assert(empty.read() == -1)
    empty.close()
    // single member, read byte-at-a-time
    val data = "hello archive".getBytes("UTF-8")
    val one = referenceFraming(data, 1 << 20, Archive.Zlib)
    val in = new ConcatZlibInputStream(new java.io.ByteArrayInputStream(one))
    val got = new ByteArrayOutputStream()
    var b = in.read()
    while (b >= 0) { got.write(b); b = in.read() }
    in.close()
    assert(got.toByteArray.sameElements(data))
  }

  test("zlib: truncated stream fails loudly instead of returning short data") {
    val data = payload(128 * 1024)
    val whole = referenceFraming(data, 1 << 20, Archive.Zlib)
    val cut = whole.take(whole.length / 2)
    val in = new ConcatZlibInputStream(new java.io.ByteArrayInputStream(cut))
    val buf = new Array[Byte](8192)
    intercept[java.io.EOFException] {
      var n = 0
      while (n >= 0) n = in.read(buf, 0, buf.length)
    }
    in.close()
  }

  test("readArchivedParquet: mixed compressed + plain dir matches the original rows") {
    import org.apache.spark.sql.functions._
    val src = tmpDir("mixed-src")
    val scratch = tmpDir("mixed-scratch")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "ts", "user_id", "event_type", "value")

    // Four single-file parquet slices: one per codec plus one left plain —
    // the mixed layout data_storage_manager.py:204-228 produces.
    val slices = events.withColumn("slice", abs(hash(col("event_id"))) % 4)
    for (i <- 0 until 4) {
      val part = tmpDir(s"slice-$i")
      slices.filter(col("slice") === i).drop("slice")
        .coalesce(1).write.mode("overwrite").parquet(part)
      val file = Files.list(Paths.get(part)).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = s"$src/slice_$i.parquet"
      Files.copy(file, Paths.get(dst))
      if (i < 3) {
        Archive.compressFile(spark, dst, method = Archive.methods(i))
        Files.delete(Paths.get(dst))
      }
    }

    val back = Archive.readArchivedParquet(spark, src, scratch)
    assert(back.count() == events.count())
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty)
  }

  test("compressDirectory -> rehydrate: distributed round trip with stats") {
    val src = tmpDir("dir-src")
    val arch = tmpDir("dir-arch")
    val back = tmpDir("dir-back")
    val contents = (0 until 6).map { i =>
      val data = payload((i + 1) * 20 * 1024)
      Files.write(Paths.get(s"$src/f$i.csv"), data)
      s"f$i.csv" -> data
    }.toMap

    val stats = Archive.compressDirectory(spark, src, arch, Archive.Bz2, level = 6)
    assert(stats.count() == 6)
    assert(stats.filter(stats("compressedSize") >= stats("originalSize")).count() == 0)

    val re = Archive.rehydrate(spark, arch, back)
    assert(re.count() == 6)
    contents.foreach { case (name, data) =>
      assert(Files.readAllBytes(Paths.get(s"$back/$name")).sameElements(data), name)
    }
  }
}
