package graft.tools

/** Cross-process probe for the lease STEAL path
  * ([[graft.operators.ManifestArtifactStore]]'s claim-by-replace, r18
  * verdict item 3; sequenced-cell atomic swap on remote schemes, r20): a
  * FRESH JVM runs the production acquisition loop against a store whose
  * lease a dead holder left EXPIRED, and proves mutual exclusion
  * on-disk rather than by timing — on acquire it claims a `create-new`
  * token file (args(2)): success prints `HELD`, a pre-existing token
  * means another JVM holds the lease concurrently and prints
  * `VIOLATION` (exactly the state a loser's late delete landing on a
  * winner's fresh claim produces). The token is removed before release;
  * `DONE` marks the clean exit. ManifestStoreSpec spawns two of these
  * against one expired lease: both must eventually hold, zero may
  * overlap.
  *
  * Usage: StealProbe <storeRoot> <holdMs> <tokenFile> [k=v ...]
  *
  * Trailing `k=v` pairs populate the probe JVM's Hadoop conf, bound for
  * the whole body exactly like a session entry point binds its own
  * ([[graft.operators.ManifestFs.withHadoopConf]]) — this is what lets
  * the spec aim the probe at an `objstore://` root of the adversarial
  * fake (`fs.objstore.impl`, `fs.graft.cas.objstore`, backing dir),
  * where no flock exists to serialize the compare+swap and only the
  * sequenced-cell CAS keeps two stealers from both winning.
  */
object StealProbe {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val holdMs = args(1).toLong
    val token = java.nio.file.Paths.get(args(2))
    val confPairs = args.drop(3).map { kv =>
      val i = kv.indexOf('=')
      kv.substring(0, i) -> kv.substring(i + 1)
    }
    def body(): Unit =
      graft.operators.ManifestArtifactStore.maintenanceLockedMs(root, 600000L) {
        val ok =
          try { java.nio.file.Files.createFile(token); true }
          catch { case _: java.nio.file.FileAlreadyExistsException => false }
        println(if (ok) "HELD" else "VIOLATION"); System.out.flush()
        Thread.sleep(holdMs)
        if (ok) java.nio.file.Files.delete(token)
        ()
      }
    if (confPairs.isEmpty) body()
    else {
      val c = new org.apache.hadoop.conf.Configuration()
      confPairs.foreach { case (k, v) => c.set(k, v) }
      graft.operators.ManifestFs.withHadoopConf(c)(body())
    }
    println("DONE"); System.out.flush()
  }
}
