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

  test("nested monthly layout: recursive rehydrate + get_archived_data parity") {
    import org.apache.spark.sql.functions._
    // the reference's tree: archives/{year}/{month:02d}/{symbol}/
    //   {symbol}_{timeframe}_{yyyyMM}.zlib|.xz|.parquet
    // (data_storage_manager.py:186-194; compressor REPLACES .parquet with
    // the codec extension via Path.with_suffix)
    val arch = tmpDir("monthly-arch")
    val scratch = tmpDir("monthly-scratch")
    val bars = graft.sources.Generator.ohlcv(spark, Seq("BTCUSDT"), 300,
      startTs = "2024-01-01 00:00:00", intervalSec = 21600) // 75 days -> 3 months
    val byMonth = bars.withColumn("ym", date_format(col("ts"), "yyyyMM"))
    val months = Seq("202401", "202402", "202403")
    months.zipWithIndex.foreach { case (ym, i) =>
      val dir = s"$arch/2024/${ym.takeRight(2)}/BTCUSDT"
      java.nio.file.Files.createDirectories(Paths.get(dir))
      val part = tmpDir(s"monthly-part-$ym")
      byMonth.filter(col("ym") === ym).drop("ym")
        .coalesce(1).write.mode("overwrite").parquet(part)
      val f = Files.list(Paths.get(part))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val plain = s"$dir/BTCUSDT_6h_$ym.parquet"
      Files.copy(f, Paths.get(plain))
      if (i < 2) { // two months compressed (zlib, xz), one left plain
        val m = Archive.methods(i)
        Archive.compressFile(spark, plain,
          dst = Some(s"$dir/BTCUSDT_6h_$ym${m.extension}"), method = m)
        Files.delete(Paths.get(plain))
      }
    }

    // recursive rehydrate keeps the year/month/symbol subtree
    val re = Archive.rehydrate(spark, arch, scratch)
    assert(re.count() == 2)
    assert(Files.exists(Paths.get(s"$scratch/2024/01/BTCUSDT/BTCUSDT_6h_202401")))

    // monthly retrieval: mixed compressed+plain months, full range
    val got = Archive.readMonthlyArchive(spark, arch, "BTCUSDT", "6h",
      "2024-01", "2024-03", tmpDir("monthly-scratch2"))
    assert(got.count() == bars.count())
    assert(got.exceptAll(bars).isEmpty && bars.exceptAll(got).isEmpty)

    // sub-range prunes by calendar: only February's rows
    val feb = Archive.readMonthlyArchive(spark, arch, "BTCUSDT", "6h",
      "2024-02", "2024-02", tmpDir("monthly-scratch3"))
    val febExpected = byMonth.filter(col("ym") === "202402").drop("ym")
    assert(feb.count() == febExpected.count() && feb.count() > 0)
    // missing months/symbols are skipped, not errors
    val none = Archive.readMonthlyArchive(spark, arch, "ETHUSDT", "6h",
      "2024-01", "2024-03", tmpDir("monthly-scratch4"))
    assert(none.isEmpty)
  }

  test("archiveToLake: mixed monthly tree -> pruned lake, idempotent resume") {
    import org.apache.spark.sql.functions._
    import graft.pipeline.ArchiveMigration
    val arch = tmpDir("mig-arch")
    val lake = tmpDir("mig-lake")
    // two symbols x three months, months 1-2 compressed, month 3 plain —
    // the reference's actual mixed layout
    val bars = graft.sources.Generator.ohlcv(spark, Seq("BTCUSDT", "ETHUSDT"),
      300, startTs = "2024-01-01 00:00:00", intervalSec = 21600)
    val byMonth = bars.withColumn("ym", date_format(col("ts"), "yyyyMM"))
    val months = Seq("202401", "202402", "202403")
    for (sym <- Seq("BTCUSDT", "ETHUSDT"); (ym, i) <- months.zipWithIndex) {
      val dir = s"$arch/2024/${ym.takeRight(2)}/$sym"
      java.nio.file.Files.createDirectories(Paths.get(dir))
      val part = tmpDir(s"mig-part-$sym-$ym")
      byMonth.filter(col("ym") === ym && col("symbol") === sym).drop("ym")
        .coalesce(1).write.mode("overwrite").parquet(part)
      val f = Files.list(Paths.get(part))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val plain = s"$dir/${sym}_6h_$ym.parquet"
      Files.copy(f, Paths.get(plain))
      if (i < 2) {
        val m = Archive.methods(i)
        Archive.compressFile(spark, plain,
          dst = Some(s"$dir/${sym}_6h_$ym${m.extension}"), method = m)
        Files.delete(Paths.get(plain))
      }
    }
    // a crashed earlier attempt: junk tmp dir that must be discarded
    val junk = Paths.get(s"$lake/.migrate_tmp_year=2024_month=1")
    java.nio.file.Files.createDirectories(junk)
    Files.writeString(junk.resolve("garbage.parquet"), "not parquet")

    val r1 = ArchiveMigration.archiveToLake(spark, arch, lake, filesPerMonth = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(r1 == Set((2024, 1, "migrated"), (2024, 2, "migrated"),
      (2024, 3, "migrated")))
    val back = spark.read.parquet(lake).drop("year", "month")
      .select(bars.columns.map(col): _*)
    assert(back.count() == bars.count())
    assert(back.exceptAll(bars).isEmpty && bars.exceptAll(back).isEmpty)
    // partition pruning works on the migrated layout
    val feb = spark.read.parquet(lake).filter(col("month") === 2)
    assert(feb.count() == byMonth.filter(col("ym") === "202402").count())
    assert(feb.queryExecution.executedPlan.toString.contains("month#"))

    // resume: re-run touches nothing (live dirs prove completion)
    val before = Files.walk(Paths.get(lake)).sorted().toArray.mkString("\n")
    val r2 = ArchiveMigration.archiveToLake(spark, arch, lake)
      .collect().map(r => (r.getInt(1), r.getString(2))).toSet
    assert(r2 == Set((1, "skipped"), (2, "skipped"), (3, "skipped")))
    assert(Files.walk(Paths.get(lake)).sorted().toArray.mkString("\n") == before,
      "idempotent re-run modified the lake")

    // misfiled rows abort the month loudly instead of corrupting pruning
    val badDir = s"$arch/2024/04/BTCUSDT"
    java.nio.file.Files.createDirectories(Paths.get(badDir))
    val badPart = tmpDir("mig-bad")
    byMonth.filter(col("ym") === "202401").drop("ym")
      .coalesce(1).write.mode("overwrite").parquet(badPart)
    val bf = Files.list(Paths.get(badPart))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    Files.copy(bf, Paths.get(s"$badDir/BTCUSDT_6h_202404.parquet"))
    val err = intercept[IllegalArgumentException] {
      ArchiveMigration.archiveToLake(spark, arch, lake)
    }
    assert(err.getMessage.contains("2024-4"))
    assert(!Files.exists(Paths.get(s"$lake/year=2024/month=4")),
      "aborted month must not publish")
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
