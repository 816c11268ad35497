package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared maintenance mechanics for materialized pipeline artifacts
  * (span-count stores, IVF vector stores, pair indexes).
  */
object Artifacts {

  /** Crash-SAFE (not atomic) write-then-swap of an artifact directory:
    * `write` produces the replacement at a sibling `.compacting` path,
    * the live dir is renamed aside (`dest -> dest.precompact`), the new
    * output promoted (`tmp -> dest`), and only then is the old copy
    * deleted — at no instant is the ONLY copy of the artifact
    * mid-delete, and a crash between the two renames leaves
    * `dest.precompact` to recover from (a stale `.precompact` from such
    * a crash is cleared on the next swap). A reader racing the swap
    * window can still observe a missing directory — callers serialize
    * maintenance against both ingest and serve, as with every artifact
    * refresh here; a production deployment on an object store would
    * stage behind a manifest instead. Invalidates the listing and
    * dir-cost caches so post-swap reads and prices see the new files.
    */
  def writeThenSwap(spark: SparkSession, destDir: String)
                   (write: String => Unit): Unit = {
    val tmp = destDir.stripSuffix("/") + ".compacting"
    val old = destDir.stripSuffix("/") + ".precompact"
    write(tmp)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(old)) // stale recovery copy from a crashed run
    require(new java.io.File(destDir).renameTo(new java.io.File(old)),
      s"could not stage $destDir -> $old")
    require(new java.io.File(tmp).renameTo(new java.io.File(destDir)),
      s"could not promote $tmp -> $destDir " +
        s"(previous artifact preserved at $old)")
    rm(new java.io.File(old))
    org.apache.spark.sql.graft.FileListingCache.invalidateAll(spark)
    org.apache.spark.sql.graft.ScanBytes.invalidateDirCosts()
  }
}
