package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}

/** The one primitive the snapshot commit protocol needs from its
  * substrate: an ATOMIC create-if-absent for the per-version lock file.
  * Everything else in the protocol (dense versions, frozen head under
  * the lock, tmp+rename publish, lease-expiry breaks) is
  * substrate-independent — but this single call decides whether two
  * racing committers can both believe they own a version, and the
  * standard filesystems disagree on how to get it:
  *
  *   - local POSIX: `java.io.File.createNewFile` is one
  *     open(O_CREAT|O_EXCL) syscall — atomic. (Hadoop's
  *     `FileSystem.createNewFile` on the LOCAL scheme is NOT: it is
  *     exists()-then-create and the create is multi-step; the 8-writer
  *     lockbench reproduced lost manifests through that window.)
  *   - HDFS: `create(path, overwrite=false)` is namenode-atomic.
  *   - object stores (s3a/gs/abfs/...): Hadoop's `createNewFile` is
  *     exists-then-PUT, and a plain PUT replaces unconditionally — the
  *     exact check-then-act race again, this time with no rename
  *     backstop either (object-store "rename" is copy+delete and
  *     replaces existing keys). The store-native primitive is the
  *     CONDITIONAL PUT (S3 `If-None-Match: *`, GCS
  *     `ifGenerationMatch=0`, Azure `If-None-Match: *`) or an external
  *     lock row (the DynamoDB pattern Delta ships for S3) — both are
  *     exactly `tryLock`, wrapped via [[CasLockProvider]] and
  *     registered for the scheme.
  *
  * Resolution is by the lock path's URI scheme ([[LockProvider.forPath]]):
  * file:// and HDFS-family schemes get the built-in providers;
  * anything else must be REGISTERED or the commit refuses loudly
  * before any data stages — a lake that can silently lose committed
  * versions is worse than one that refuses to start.
  */
trait LockProvider {

  /** Atomically create `lock`; true iff THIS call transitioned it from
    * absent to present. Any failure mode that cannot prove creation
    * must return false (the commit loop re-examines and retries) —
    * never true-on-doubt, which is how manifests get lost.
    */
  def tryLock(fs: FileSystem, lock: Path): Boolean

  /** Release (idempotent; also used to break a provably-dead owner's
    * expired lock).
    */
  def unlock(fs: FileSystem, lock: Path): Unit = fs.delete(lock, false)
}

/** Adapter for stores whose atomic primitive is a conditional PUT (or
  * any external CAS): `put` must atomically create the lock object iff
  * absent and report whether THIS call created it. Exceptions from the
  * primitive read as "did not acquire" — the commit loop re-examines;
  * a persistent store failure surfaces through the commit deadline.
  */
final class CasLockProvider(put: (FileSystem, Path) => Boolean)
    extends LockProvider {
  override def tryLock(fs: FileSystem, lock: Path): Boolean =
    try put(fs, lock) catch { case _: java.io.IOException => false }
}

object LockProvider {

  /** file:// (and schemeless) — one open(O_CREAT|O_EXCL) syscall. */
  object Posix extends LockProvider {
    override def tryLock(fs: FileSystem, lock: Path): Boolean =
      try new java.io.File(lock.toUri.getPath).createNewFile()
      catch { case _: java.io.IOException => false }
  }

  /** Schemes whose `FileSystem.create(path, overwrite=false)` is a true
    * server-side atomic create (HDFS family: the namenode serializes
    * the namespace mutation). `createNewFile` delegates to exactly
    * that call on these schemes.
    */
  object AtomicCreate extends LockProvider {
    override def tryLock(fs: FileSystem, lock: Path): Boolean =
      try fs.createNewFile(lock)
      catch { case _: java.io.IOException => false }
  }

  /** Schemes where Hadoop's create-no-overwrite is enforced atomically
    * server-side. Deliberately SHORT: a scheme not provably atomic
    * belongs in the registry with a store-native CAS, not here.
    */
  private val AtomicCreateSchemes = Set("hdfs", "webhdfs", "viewfs")

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, LockProvider]()

  /** Register the commit-lock provider for a URI scheme (e.g. a
    * [[CasLockProvider]] wrapping S3's `If-None-Match: *` PUT for
    * `s3a`). Replaces any previous registration, including the
    * built-ins — a deployment that fronts HDFS with a lock service can
    * override `hdfs` too.
    */
  def register(scheme: String, provider: LockProvider): Unit =
    registry.put(scheme.toLowerCase(java.util.Locale.ROOT), provider)

  /** The provider for a lock path, by URI scheme. Unknown schemes
    * REFUSE loudly: on them `FileSystem.createNewFile` is
    * exists-then-create, the precise race the 8-writer lockbench
    * proved loses committed manifests on a non-atomic substrate.
    */
  def forPath(lock: Path): LockProvider = {
    val scheme = Option(lock.toUri.getScheme)
      .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("file")
    Option(registry.get(scheme)).getOrElse {
      if (scheme == "file") Posix
      else if (AtomicCreateSchemes.contains(scheme)) AtomicCreate
      else throw new IllegalStateException(
        s"snapshot commits on scheme '$scheme' have NO atomic " +
          "create-if-absent: Hadoop's createNewFile is exists-then-create " +
          "there, so racing committers can silently lose manifests (the " +
          "failure the 8-writer lockbench reproduced). Register the " +
          "store's conditional-PUT primitive first, e.g. " +
          s"""LockProvider.register("$scheme", new CasLockProvider(...)) """ +
          "(S3: If-None-Match \"*\"; GCS: ifGenerationMatch=0; Azure: " +
          "If-None-Match \"*\"; or an external lock row, Delta's DynamoDB " +
          "pattern).")
    }
  }
}
