package graft.tools

/** Cross-process probe for the lease STEAL path
  * ([[graft.operators.ManifestArtifactStore]]'s claim-by-replace, r18
  * verdict item 3): a FRESH JVM runs the production acquisition loop
  * against a store whose lease a dead holder left EXPIRED, and proves
  * mutual exclusion on-disk rather than by timing — on acquire it
  * claims a `create-new` token file (args(2)): success prints `HELD`,
  * a pre-existing token means another JVM holds the lease concurrently
  * and prints `VIOLATION` (exactly the state a loser's late delete
  * landing on a winner's fresh claim produces). The token is removed
  * before release; `DONE` marks the clean exit. ManifestStoreSpec
  * spawns two of these against one expired lease: both must eventually
  * hold, zero may overlap.
  *
  * Usage: StealProbe <storeRoot> <holdMs> <tokenFile>
  */
object StealProbe {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val holdMs = args(1).toLong
    val token = java.nio.file.Paths.get(args(2))
    graft.operators.ManifestArtifactStore.maintenanceLockedMs(root, 600000L) {
      val ok =
        try { java.nio.file.Files.createFile(token); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      println(if (ok) "HELD" else "VIOLATION"); System.out.flush()
      Thread.sleep(holdMs)
      if (ok) java.nio.file.Files.delete(token)
      ()
    }
    println("DONE"); System.out.flush()
  }
}
