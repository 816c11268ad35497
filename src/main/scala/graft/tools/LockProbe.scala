package graft.tools

/** Cross-process probe for
  * [[graft.operators.Artifacts.withProcessLock]]'s OS advisory lock: a
  * FRESH JVM tryLocks the given path and prints `HELD` (some other
  * process owns it) or `FREE` (acquired here, then released).
  * ArtifactsLockSpec spawns this to verify the lock excludes across REAL
  * process boundaries — an in-JVM tryLock cannot test that, because
  * java.nio file locks are held on behalf of the whole JVM and a
  * same-JVM re-acquisition throws instead of blocking.
  */
object LockProbe {
  def main(args: Array[String]): Unit = {
    val p = java.nio.file.Paths.get(args(0))
    val shared = args.length > 1 && args(1) == "shared"
    val ch = java.nio.channels.FileChannel.open(p,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.READ,
      java.nio.file.StandardOpenOption.WRITE)
    // shared mode probes the READ side of an artifact gate: FREE while
    // other processes hold it shared, HELD only against an exclusive
    val l = ch.tryLock(0L, Long.MaxValue, shared)
    if (l == null) println("HELD") else { l.release(); println("FREE") }
    ch.close()
  }
}
