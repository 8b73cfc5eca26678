package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev tool: phase timing for the `sn6`/`sn7` SQL-doorway queries —
  * `runMain graft.tools.DoorProf [sn6|sn7]` with `SPARK_GRAFT_SF_DIR`.
  * Splits the query's wall time into its construction phases (fixture
  * scan+split, the two format writes with their footer probes, the SQL
  * read-back) so a scale ratio can be attributed to the phase that
  * carries it — writes are lake-BOOTSTRAP constants (stage + probe +
  * commit), the read is the steady-state doorway cost a user actually
  * pays per query.
  */
object DoorProf {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("sn6")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[doorprof] $which/$name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"[doorprof] === $which round $round ($sfDir) ===")
      val b = Tables.bars(spark, sfDir)
        .select("event_id", "symbol", "ts", "close")
      val root = graft.TempDirs.create(s"graft-doorprof-$which$round") + "/lake"
      val r = phase("fixture_agg")(
        b.agg(min("event_id"), max("event_id")).head)
      val mid = (r.getLong(0) + r.getLong(1)) / 2
      val w = b.filter(col("event_id") < mid).repartition(2)
        .write.format("graft-snapshot").option("statsCols", "event_id")
      phase("write1")((if (which == "sn7") w.option("partitionCols", "symbol")
        else w).save(root))
      val w2 = b.filter(col("event_id") >= mid).repartition(2)
        .write.format("graft-snapshot").mode("append")
        .option("statsCols", "event_id")
      if (which == "sn6") {
        phase("write2")(w2.save(root))
        spark.read.format("graft-snapshot").load(root)
          .createOrReplaceTempView("doorprof_lake")
        phase("sql_read")(spark.sql(
          s"SELECT event_id, symbol, ts, close FROM doorprof_lake " +
            s"WHERE event_id < $mid")
          .write.format("noop").mode("overwrite").save())
      } else {
        spark.sql("DROP TABLE IF EXISTS doorprof_tbl")
        phase("create_table")(spark.sql(
          s"CREATE TABLE doorprof_tbl USING `graft-snapshot` OPTIONS (path '$root')"))
        b.filter(col("event_id") >= mid).repartition(2)
          .createOrReplaceTempView("doorprof_src")
        phase("sql_insert")(spark.sql(
          "INSERT INTO doorprof_tbl SELECT event_id, symbol, ts, close " +
            "FROM doorprof_src"))
        phase("sql_read")(spark.sql(
          "SELECT event_id, symbol, ts, close FROM doorprof_tbl " +
            "WHERE symbol = (SELECT min(symbol) FROM doorprof_tbl)")
          .write.format("noop").mode("overwrite").save())
      }
    }
    spark.stop()
  }
}
