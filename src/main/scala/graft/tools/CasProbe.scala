package graft.tools

/** Cross-process probe for the manifest protocol's conditional-PUT
  * primitive ([[graft.operators.ManifestArtifactStore]]'s `publish`
  * emulation): a FRESH JVM races to claim the given target file with
  * the exact staging discipline the engine uses — write full content to
  * a temp sibling, then atomically hard-link it to the target name —
  * and prints `WON` or `LOST`. ManifestStoreSpec spawns several of
  * these against one version file to verify that exactly one writer's
  * full content ever becomes visible, across REAL process boundaries
  * (same-JVM threads cannot prove OS-level atomicity of link creation
  * any more than they could prove flock exclusion for [[LockProbe]]).
  *
  * Usage: CasProbe <targetFile> <content>
  */
object CasProbe {
  def main(args: Array[String]): Unit = {
    val target = java.nio.file.Paths.get(args(0))
    val content = args(1)
    val tmp = target.getParent.resolve(
      s"tmp-${java.util.UUID.randomUUID()}.json")
    java.nio.file.Files.createDirectories(target.getParent)
    java.nio.file.Files.writeString(tmp, content)
    val won =
      try { java.nio.file.Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
      finally java.nio.file.Files.deleteIfExists(tmp)
    println(if (won) "WON" else "LOST")
    System.out.flush()
  }
}
