package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared maintenance mechanics for materialized pipeline artifacts
  * (span-count stores, IVF vector stores, pair indexes).
  */
object Artifacts {

  /** Per-artifact swap locks: [[writeThenSwap]] holds the WRITE side only
    * across the rename window (the expensive rewrite into `.compacting`
    * runs unlocked, concurrent with readers); [[readLocked]] readers hold
    * the READ side across listing + scan, so a probe racing a swap sees
    * either the whole old directory or the whole new one — never a
    * mid-rename miss or a torn listing. In-JVM only (this sandbox's
    * single-driver reality); a multi-driver deployment on an object
    * store would stage behind a manifest instead.
    */
  private val swapLocks = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.locks.ReentrantReadWriteLock]()

  // normalize() resolves "." and ".." so two spellings of one directory
  // share one lock (getAbsolutePath would leave "a/../a" distinct);
  // symlinked spellings are out of scope — artifacts live under
  // target/indexes and are addressed by their literal build path
  private def lockFor(destDir: String) =
    swapLocks.computeIfAbsent(
      java.nio.file.Paths.get(destDir.stripSuffix("/"))
        .toAbsolutePath.normalize().toString,
      _ => new java.util.concurrent.locks.ReentrantReadWriteLock())

  /** Run `f` (listing + read + materialize) against one consistent
    * generation of the artifact at `destDir`: any concurrent
    * [[writeThenSwap]] rename window waits until `f` finishes, and `f`
    * waits out any in-flight window. Keep `f` to the serve itself — the
    * lock serializes against maintenance, not against other readers.
    */
  def readLocked[T](destDir: String)(f: => T): T = {
    val l = lockFor(destDir).readLock()
    l.lock()
    try f finally l.unlock()
  }

  /** Crash-SAFE (not atomic) write-then-swap of an artifact directory:
    * `write` produces the replacement at a sibling `.compacting` path,
    * the live dir is renamed aside (`dest -> dest.precompact`), the new
    * output promoted (`tmp -> dest`), and only then is the old copy
    * deleted — at no instant is the ONLY copy of the artifact
    * mid-delete, and a crash between the two renames leaves
    * `dest.precompact` to recover from (a stale `.precompact` from such
    * a crash is cleared on the next swap). The rename window runs under
    * the artifact's WRITE lock, so [[readLocked]] readers see either the
    * old or the new listing, never a missing/torn directory; unlocked
    * readers get the old weaker contract (serialize externally).
    * Callers still serialize maintenance against ingest and OTHER
    * maintenance, as with every artifact refresh here. Invalidates the
    * listing and dir-cost caches (inside the lock) so post-swap reads
    * and prices see the new files.
    */
  def writeThenSwap(spark: SparkSession, destDir: String)
                   (write: String => Unit): Unit = {
    val tmp = destDir.stripSuffix("/") + ".compacting"
    val old = destDir.stripSuffix("/") + ".precompact"
    write(tmp)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    val l = lockFor(destDir).writeLock()
    l.lock()
    try {
      rm(new java.io.File(old)) // stale recovery copy from a crashed run
      require(new java.io.File(destDir).renameTo(new java.io.File(old)),
        s"could not stage $destDir -> $old")
      require(new java.io.File(tmp).renameTo(new java.io.File(destDir)),
        s"could not promote $tmp -> $destDir " +
          s"(previous artifact preserved at $old)")
      rm(new java.io.File(old))
      org.apache.spark.sql.graft.FileListingCache.invalidateAll(spark)
      org.apache.spark.sql.graft.ScanBytes.invalidateDirCosts()
    } finally l.unlock()
  }
}
