package graft

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}

/** A deliberately NON-ATOMIC "object store" for the LockProvider specs:
  * local disk behind a `fakeobj://` scheme, reproducing the two s3a
  * behaviors that break check-then-act commit protocols —
  *
  *   - `createNewFile` is exists()-then-PUT with the race window
  *     WIDENED (a sleep between the check and the act), so two racers
  *     can both believe they created the lock;
  *   - `rename` onto an existing destination REPLACES it (object-store
  *     rename is copy+delete), so the manifest publish rename is no
  *     backstop either.
  *
  * Instantiated by Hadoop reflection via `fs.fakeobj.impl`.
  */
class NonAtomicFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "fakeobj"
  override def getUri: URI = URI.create(s"$getScheme:///")

  override def createNewFile(f: Path): Boolean = {
    if (exists(f)) false
    else {
      Thread.sleep(2) // the exists -> create window, widened
      val out = create(f, true) // a plain PUT replaces unconditionally
      out.close()
      true
    }
  }

  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst) && !getFileStatus(dst).isDirectory) delete(dst, false)
    super.rename(src, dst)
  }
}

/** Same store under a second scheme that the spec never registers a
  * LockProvider for — the loud-refusal case must not be poisoned by the
  * storm case's registration (the registry is JVM-global).
  */
class NonAtomicFileSystem2 extends NonAtomicFileSystem {
  override def getScheme: String = "fakeobj2"
}

object NonAtomicFileSystem {
  private val mutex = new Object

  /** Simulates the store's SERVER-SIDE conditional PUT (S3's
    * `If-None-Match: *`): the exists+create pair executes atomically —
    * on the server that atomicity is the storage layer's; here it is a
    * JVM-global mutex, which is exactly what a single authority
    * serializing PUTs gives you.
    */
  def conditionalPut(fs: FileSystem, path: Path): Boolean = mutex.synchronized {
    if (fs.exists(path)) false
    else {
      val out = fs.create(path, false)
      out.close()
      true
    }
  }
}
