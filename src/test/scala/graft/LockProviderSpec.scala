package graft

import java.util.concurrent.CountDownLatch

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

import graft.sinks.{CasLockProvider, LockProvider, SnapshotLake}

/** The object-store-safe commit lock (round 14): the commit protocol's
  * atomic create-if-absent lives behind the [[LockProvider]] seam, and
  * these specs prove each leg of the contract against a deliberately
  * NON-ATOMIC fake object store ([[NonAtomicFileSystem]]):
  *
  *   1. the fake reproduces s3a's hazard — two racers both "create" the
  *      same lock through Hadoop's exists-then-create, and rename
  *      replaces existing destinations (no publish backstop);
  *   2. an UNREGISTERED scheme refuses commits loudly instead of
  *      silently racing;
  *   3. with a registered conditional-PUT CAS provider, an 8-writer
  *      commit storm lands every append exactly once — dense versions,
  *      no lost manifests, no duplicated rows — on the very store whose
  *      native create is proven unsafe in (1).
  */
class LockProviderSpec extends SparkSpec {

  private def hconf = spark.sparkContext.hadoopConfiguration

  private def enableFakeSchemes(): Unit = {
    hconf.set("fs.fakeobj.impl", classOf[NonAtomicFileSystem].getName)
    hconf.set("fs.fakeobj2.impl", classOf[NonAtomicFileSystem2].getName)
  }

  test("the fake store's createNewFile is genuinely non-atomic " +
      "(two racers both win) and its rename replaces") {
    enableFakeSchemes()
    val fs = new Path("fakeobj:///").getFileSystem(hconf)
    val dir = TempDirs.create("lockprov-hazard")
    var collided = false
    var round = 0
    while (!collided && round < 50) {
      val lock = new Path(s"fakeobj://$dir/r$round.lock")
      val start = new CountDownLatch(1)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val ts = (0 until 2).map(_ => new Thread(() => {
        start.await()
        if (fs.createNewFile(lock)) wins.incrementAndGet()
      }))
      ts.foreach(_.start()); start.countDown(); ts.foreach(_.join())
      if (wins.get() > 1) collided = true
      round += 1
    }
    assert(collided,
      "expected at least one double-win in 50 rounds — the fake is " +
        "supposed to reproduce the exists-then-create race")
    // rename onto an existing destination replaces it — the publish
    // rename is NO backstop on this store
    val a = new Path(s"fakeobj://$dir/a")
    val b = new Path(s"fakeobj://$dir/b")
    Seq(a -> "old", b -> "new").foreach { case (p, s) =>
      val o = fs.create(p, true); o.write(s.getBytes("UTF-8")); o.close()
    }
    assert(fs.rename(b, a), "fake rename should replace, not refuse")
    val in = fs.open(a)
    val buf = new Array[Byte](8)
    val n = in.read(buf); in.close()
    assert(new String(buf, 0, n, "UTF-8") == "new")
  }

  test("commits on an unregistered non-atomic scheme refuse loudly " +
      "before any version can be lost") {
    enableFakeSchemes()
    val root = s"fakeobj2://${TempDirs.create("lockprov-refuse")}/lake"
    val e = intercept[IllegalStateException] {
      SnapshotLake.append(spark, root,
        spark.range(0, 10, 1, 1).toDF("id"), statsCols = Seq("id"))
    }
    assert(e.getMessage.contains("conditional-PUT") ||
      e.getMessage.contains("atomic"),
      s"refusal must point at the registration seam, got: ${e.getMessage}")
    // nothing half-committed
    assert(SnapshotLake.latestVersion(spark, root).isEmpty)
  }

  test("8-writer commit storm through a registered conditional-PUT CAS " +
      "provider is exactly-once on the non-atomic store") {
    enableFakeSchemes()
    LockProvider.register("fakeobj",
      new CasLockProvider(NonAtomicFileSystem.conditionalPut))
    val root = s"fakeobj://${TempDirs.create("lockprov-storm")}/lake"
    val writers = 8
    val perWriter = 3
    val start = new CountDownLatch(1)
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val threads = (0 until writers).map { w =>
      val t = new Thread(() => {
        try {
          start.await()
          (0 until perWriter).foreach { i =>
            val base = w * 1000000L + i * 1000L
            SnapshotLake.append(spark, root,
              spark.range(base, base + 100L, 1, 1).toDF("id"),
              statsCols = Seq("id"))
          }
        } catch { case e: Throwable => failed.compareAndSet(null, e) }
      })
      t.setName(s"lockprov-storm-w$w"); t
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    assert(failed.get() == null, s"writer failed: ${failed.get()}")
    // dense versions: every commit won exactly one number, none lost to
    // a rival's PUT or rename-replace
    val versions = SnapshotLake.versions(spark, root)
    assert(versions == (1L to (writers.toLong * perWriter)),
      s"versions not dense: $versions")
    val lake = SnapshotLake.read(spark, root)
    assert(lake.count() == writers.toLong * perWriter * 100L)
    assert(lake.select(col("id")).distinct().count() ==
      writers.toLong * perWriter * 100L, "a commit's rows were duplicated")
    // every writer's every batch is present — no append silently dropped
    (0 until writers).foreach { w =>
      (0 until perWriter).foreach { i =>
        val base = w * 1000000L + i * 1000L
        assert(lake.filter(col("id") >= base && col("id") < base + 100L)
          .count() == 100L, s"writer $w batch $i lost")
      }
    }
  }
}
