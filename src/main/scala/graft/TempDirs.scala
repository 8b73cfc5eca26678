package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** JVM-lifetime temp directories with guaranteed cleanup: the query
  * catalogs cache per-sf-dir index builds (tidx/vidx/ar1) in temp dirs so
  * one build serves a whole verify/bench sweep, but a bare
  * `Files.createTempDirectory` leaks the tree on exit — the long-lived
  * gate harness JVMs accumulate multi-GB stray `graft-*` dirs across
  * sweeps (VERDICT r7 item 8). Every caller goes through [[create]],
  * which registers one shutdown hook that deletes all registered trees.
  *
  * Deletion is best-effort (exceptions swallowed per path): at shutdown a
  * half-deleted temp tree is strictly better than an aborted hook, and
  * nothing here is ever a durability surface — durable indexes live under
  * caller-chosen paths via TextIndex/VectorIndex and never pass through
  * this object.
  */
object TempDirs {
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  // one hook, installed on first use
  private lazy val installHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(deleteRecursively(_))
    }, "graft-tempdir-cleanup"))

  /** Create a temp directory that is deleted when this JVM exits. */
  def create(prefix: String): String = {
    installHook
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }

  private def deleteRecursively(root: Path): Unit =
    try {
      val walk = Files.walk(root)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
      finally walk.close()
    } catch { case _: Exception => () }
}
