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
    val mode = if (args.length > 1) args(1) else "exclusive"
    val ch = java.nio.channels.FileChannel.open(p,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.READ,
      java.nio.file.StandardOpenOption.WRITE)
    mode match {
      // hold-shared <ms>: acquire SHARED (blocking), announce, hold for
      // <ms>, release — lets a spec verify that an exclusive taker (e.g.
      // writeThenSwap's rename window) WAITS for a cross-process reader
      case "hold-shared" =>
        val holdMs = args(2).toLong
        val l = ch.lock(0L, Long.MaxValue, true)
        println("ACQUIRED"); System.out.flush()
        Thread.sleep(holdMs)
        l.release()
        println("RELEASED"); System.out.flush()
      // hold-exclusive <ms>: the writer-intent shape — lets a spec
      // verify a FOREIGN process's .gate.intent hold parks readers
      case "hold-exclusive" =>
        val holdMs = args(2).toLong
        val l = ch.lock()
        println("ACQUIRED"); System.out.flush()
        Thread.sleep(holdMs)
        l.release()
        println("RELEASED"); System.out.flush()
      // shared: probe the READ side of an artifact gate — FREE while
      // other processes hold it shared, HELD only against an exclusive
      case other =>
        val l = ch.tryLock(0L, Long.MaxValue, other == "shared")
        if (l == null) println("HELD") else { l.release(); println("FREE") }
    }
    ch.close()
  }
}
