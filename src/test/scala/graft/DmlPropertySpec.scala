package graft

import scala.collection.mutable

import graft.sinks.SnapshotLake

/** Property test for the SQL DML doorway: a seeded random sequence of
  * INSERT / ranged DELETE (metadata path) / modulo DELETE and UPDATE
  * (copy-on-write path) / MERGE INTO (all three clause kinds) runs
  * against a catalog table, and after EVERY statement the lake must
  * equal an in-memory model applying the same mutation — so any
  * mis-dispatch, lost row, resurrected row, or tag-projection slip in
  * the row-level write shows up at the exact op that caused it, with
  * the seed to replay.
  */
class DmlPropertySpec extends SparkSpec {
  import spark.implicits._

  test("25 random SQL DML statements keep the lake bit-equal to the model") {
    val seed = 42
    val rnd = new scala.util.Random(seed)
    val root = TempDirs.create("dmlprop") + "/lake"
    spark.sql("DROP TABLE IF EXISTS dmlprop")
    // model: event_id -> (symbol, close)
    val model = mutable.Map.empty[Long, (String, Double)]
    var nextId = 0L
    def freshRows(n: Int): Seq[(Long, String, Double)] =
      (0 until n).map { _ =>
        val id = nextId; nextId += 1
        (id, s"sym${id % 3}", (id * 7 % 1000).toDouble)
      }
    val init = freshRows(40)
    init.foreach { case (id, s, c) => model(id) = (s, c) }
    init.toDF("event_id", "symbol", "close").repartition(2)
      .write.format("graft-snapshot").option("statsCols", "event_id")
      .save(root)
    spark.sql(s"CREATE TABLE dmlprop USING `graft-snapshot` " +
      s"OPTIONS (path '$root')")

    def lakeState(): Set[(Long, String, Double)] =
      spark.sql("SELECT event_id, symbol, close FROM dmlprop").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    def modelState(): Set[(Long, String, Double)] =
      model.map { case (id, (s, c)) => (id, s, c) }.toSet

    for (op <- 1 to 25) {
      val kind = rnd.nextInt(5)
      val desc = kind match {
        case 0 => // INSERT a fresh batch
          val rows = freshRows(3 + rnd.nextInt(5))
          rows.foreach { case (id, s, c) => model(id) = (s, c) }
          rows.toDF("event_id", "symbol", "close")
            .createOrReplaceTempView("dmlprop_src")
          spark.sql("INSERT INTO dmlprop " +
            "SELECT event_id, symbol, close FROM dmlprop_src")
          s"insert ${rows.size}"
        case 1 => // ranged DELETE — metadata path
          val lo = rnd.nextLong(math.max(1L, nextId))
          val hi = lo + 1 + rnd.nextInt(10)
          model.keys.filter(id => id >= lo && id < hi).toSeq
            .foreach(model.remove)
          spark.sql(s"DELETE FROM dmlprop WHERE event_id >= $lo " +
            s"AND event_id < $hi")
          s"delete [$lo,$hi)"
        case 2 => // modulo DELETE — copy-on-write path
          val k = 2 + rnd.nextInt(5); val r = rnd.nextInt(k)
          val doomed = model.keys.filter(_ % k == r).toSeq
          doomed.foreach(model.remove)
          spark.sql(s"DELETE FROM dmlprop WHERE event_id % $k = $r")
          s"delete %$k=$r (${doomed.size})"
        case 3 => // modulo UPDATE — copy-on-write path
          val k = 2 + rnd.nextInt(5); val r = rnd.nextInt(k)
          val d = (1 + rnd.nextInt(9)) * 1000.0
          model.keys.filter(_ % k == r).toSeq.foreach { id =>
            val (s, c) = model(id); model(id) = (s, c + d)
          }
          spark.sql(s"UPDATE dmlprop SET close = close + $d " +
            s"WHERE event_id % $k = $r")
          s"update %$k=$r +$d"
        case _ => // MERGE — update some existing, insert some new
          val existing = rnd.shuffle(model.keys.toSeq.sorted)
            .take(2 + rnd.nextInt(4))
          val news = freshRows(1 + rnd.nextInt(3))
          val c0 = (op * 100000).toDouble
          val src = existing.map(id => (id, s"sym${id % 3}", c0)) ++ news
          src.toDF("event_id", "symbol", "close")
            .createOrReplaceTempView("dmlprop_src")
          existing.foreach(id => model(id) = (s"sym${id % 3}", c0))
          news.foreach { case (id, s, c) => model(id) = (s, c) }
          spark.sql("""MERGE INTO dmlprop t USING dmlprop_src s
                       ON t.event_id = s.event_id
                       WHEN MATCHED THEN UPDATE SET close = s.close
                       WHEN NOT MATCHED THEN INSERT *""")
          s"merge upd=${existing.size} ins=${news.size}"
      }
      assert(lakeState() == modelState(),
        s"lake diverged from model after op $op ($desc) — seed $seed")
    }
    // history accumulated one commit per mutating statement; the head is
    // a sane snapshot (no torn state) and old versions stay readable
    val versions = SnapshotLake.versions(spark, root)
    assert(versions.size >= 15, s"expected >=15 commits, got $versions")
    assert(SnapshotLake.read(spark, root, Some(versions.head)).count() == 40)
    spark.sql("DROP TABLE dmlprop")
  }
}
