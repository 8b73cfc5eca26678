package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Archive

/** One-shot migration of the reference's on-disk archive tree into the
  * partitioned lake — the first operation a reference user actually runs
  * when switching engines: their history lives as
  * `archives/{year}/{month:02d}/{symbol}/{symbol}_{tf}_{yyyyMM}.(parquet|zlib|xz|bz2)`
  * (data_storage_manager.py:186-194) and every query in this library
  * wants the partitioned `year=Y/month=M` zstd lake ([[graft.sinks.Lake]]).
  *
  * Unit of work = one calendar month. Each month is migrated
  * INDEPENDENTLY and IDEMPOTENTLY with the same rename-swap discipline
  * as the lake maintenance jobs:
  *
  *  1. leftover `.migrate_tmp_*` dirs (a previous crash mid-write) are
  *     deleted at entry — tmp data is never trusted;
  *  2. a month whose live `year=Y/month=M` dir already exists is SKIPPED
  *     — live dirs only ever appear via the atomic rename in step 4, so
  *     existence proves a completed migration (this is the resume path:
  *     re-run the same command after any failure and only unfinished
  *     months do work);
  *  3. the month's subtree is rehydrated (distributed, one task per
  *     archive file) and scanned via [[Archive.readArchivedParquet]];
  *     rows are range-partitioned and clustered on (symbol, ts) — the
  *     same file-level clustering [[graft.sinks.Lake.writeArchive]]
  *     produces, but with `filesPerMonth` parallel writers per month
  *     instead of one task per month (a 100 TB month is not a
  *     single-task write);
  *  4. the files land in `.migrate_tmp_year=Y_month=M` and a single
  *     rename publishes them as `year=Y/month=M`.
  *
  * Misfiled rows fail loudly: if a month's archives contain timestamps
  * outside that calendar month, migrating them under `year=Y/month=M`
  * would make every partition-pruned read silently wrong, so the month
  * aborts with a count of the offending rows instead.
  *
  * Returns one row per discovered month:
  * (year, month, action: migrated|skipped, rows).
  */
object ArchiveMigration {

  def archiveToLake(spark: SparkSession, archiveDir: String, lakePath: String,
      filesPerMonth: Int = 8): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new HPath(archiveDir).toUri, conf)
    val lakeFs = FileSystem.get(new HPath(lakePath).toUri, conf)
    lakeFs.mkdirs(new HPath(lakePath))

    // 1. never trust tmp leftovers
    lakeFs.listStatus(new HPath(lakePath))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(".migrate_tmp_"))
      .foreach(st => lakeFs.delete(st.getPath, true))

    // discover months from the tree shape (numeric year/month dirs);
    // listing-sized driver state, like readMonthlyArchive's month list
    def numericDirs(p: HPath): Seq[(Int, HPath)] =
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.forall(_.isDigit))
        .map(st => (st.getPath.getName.toInt, st.getPath))
    val months: Seq[(Int, Int, HPath)] = for {
      (y, yDir) <- numericDirs(new HPath(archiveDir))
      (m, mDir) <- numericDirs(yDir)
    } yield (y, m, mDir)

    val results = months.sortBy(t => (t._1, t._2)).map { case (y, m, mDir) =>
      val live = new HPath(lakePath, s"year=$y/month=$m")
      if (lakeFs.exists(live)) (y, m, "skipped", -1L)
      else {
        val scratch = graft.TempDirs.create(s"graft-migrate-$y-$m")
        // The reference's compressor REPLACES ".parquet" with the codec
        // extension (Path.with_suffix), so rehydrated payloads come back
        // WITHOUT the .parquet suffix — re-add it (the same re-suffix
        // readMonthlyArchive applies) before the scan, or the parquet
        // reader ignores every rehydrated file.
        val rehydrated = Archive.rehydrate(spark, mDir.toString, scratch)
          .select("dst").collect().map(_.getString(0)).toSeq
        val scratchFs = FileSystem.get(new HPath(scratch).toUri, conf)
        val rehydratedParquet = rehydrated.map { d =>
          if (d.endsWith(".parquet")) d
          else {
            require(scratchFs.rename(new HPath(d), new HPath(s"$d.parquet")),
              s"re-suffix rename failed: $d")
            s"$d.parquet"
          }
        }
        def plainParquetUnder(dir: HPath): Seq[String] = {
          val it = fs.listFiles(dir, true)
          Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
            .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
            .map(_.getPath.toString).toSeq
        }
        val df = spark.read.parquet(
          (plainParquetUnder(mDir) ++ rehydratedParquet): _*)
        val agg = df.agg(count(lit(1)),
          sum(when(year(col("ts")) =!= y || month(col("ts")) =!= m, 1L)
            .otherwise(0L))).collect()(0)
        val total = agg.getLong(0)
        val misfiled = if (agg.isNullAt(1)) 0L else agg.getLong(1)
        require(misfiled == 0,
          s"month $y-$m: $misfiled of $total rows have timestamps outside " +
            s"the month — migrating them under year=$y/month=$m would " +
            "corrupt partition pruning; fix the source tree first")
        val tmp = new HPath(lakePath, s".migrate_tmp_year=${y}_month=$m")
        df.repartitionByRange(filesPerMonth, col("symbol"), col("ts"))
          .sortWithinPartitions("symbol", "ts")
          .write.mode("overwrite").option("compression", "zstd")
          .parquet(tmp.toString)
        lakeFs.mkdirs(live.getParent)
        require(lakeFs.rename(tmp, live), s"publish rename failed: $tmp -> $live")
        (y, m, "migrated", total)
      }
    }
    results.toDF("year", "month", "action", "rows")
  }
}
