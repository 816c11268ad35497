package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Artifacts

/** [[graft.operators.Artifacts.withProcessLock]] — the OS advisory lock
  * that turns the build-once-per-content-tagged-path discipline into an
  * invariant across driver JVMs (r13 verdict item 3). Three layers:
  * re-entrancy (the recluster cycle nests build locks), same-JVM thread
  * exclusion (java.nio file locks are per-JVM, so threads must queue
  * in front of the channel lock), and REAL cross-process exclusion,
  * verified by spawning a fresh JVM ([[graft.tools.LockProbe]]) that
  * tryLocks the same path — the only honest test, since a same-JVM
  * second acquisition throws `OverlappingFileLockException` instead of
  * blocking and so cannot stand in for another process.
  */
class ArtifactsLockSpec extends AnyFunSuite {

  private def lockPath(name: String): String = {
    val d = new java.io.File("/root/repo/target/lockspec")
    d.mkdirs()
    new java.io.File(d, name).getPath
  }

  test("withProcessLock is re-entrant per thread") {
    val p = lockPath("reentrant.lock")
    val got = Artifacts.withProcessLock(p) {
      Artifacts.withProcessLock(p) { 42 }
    }
    assert(got == 42)
    // fully released: a fresh direct tryLock on the file succeeds
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(p),
      java.nio.file.StandardOpenOption.WRITE)
    val l = ch.tryLock()
    assert(l != null, "lock not released after nested exit")
    l.release(); ch.close()
  }

  test("withProcessLock serializes same-JVM threads") {
    val p = lockPath("threads.lock")
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val threads = (0 until 4).map { _ =>
      new Thread(() => {
        try {
          for (_ <- 0 until 25) Artifacts.withProcessLock(p) {
            val n = inside.incrementAndGet()
            maxInside.getAndUpdate(m => math.max(m, n))
            inside.decrementAndGet()
          }
        } catch { case t: Throwable => err.set(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(err.get() == null, s"locking failed: ${err.get()}")
    assert(maxInside.get() == 1,
      s"${maxInside.get()} threads inside the critical section at once")
  }

  /** tryLock `p` from a freshly spawned JVM ([[graft.tools.LockProbe]]):
    * "HELD" = some other process owns it, "FREE" = it was acquirable.
    * `mode = "shared"` tries a SHARED lock (free while other processes
    * hold it shared; held only against an exclusive owner).
    */
  private def probe(p: String, mode: String = "exclusive"): String = {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    // classpath from the code sources of LockProbe and scala-library
    // (sbt's layered classloaders make java.class.path useless here);
    // the probe depends on nothing else
    def src(c: Class[_]) = new java.io.File(
      c.getProtectionDomain.getCodeSource.getLocation.toURI).getPath
    val cp = Seq(src(graft.tools.LockProbe.getClass),
        src(scala.Predef.getClass))
      .mkString(java.io.File.pathSeparator)
    val pb =
      if (mode == "shared")
        new ProcessBuilder(javaBin, "-cp", cp, "graft.tools.LockProbe",
          p, "shared")
      else
        new ProcessBuilder(javaBin, "-cp", cp, "graft.tools.LockProbe", p)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes()).trim
    val done = proc.waitFor(60, java.util.concurrent.TimeUnit.SECONDS)
    assert(done, "LockProbe JVM did not finish")
    out.linesIterator.toSeq.lastOption.getOrElse("")
  }

  test("withProcessLock excludes a second PROCESS while held, frees after") {
    val p = lockPath("crossproc.lock")
    val seen = Artifacts.withProcessLock(p) { probe(p) }
    assert(seen == "HELD",
      s"a second JVM acquired the lock while this one held it: '$seen'")
    assert(probe(p) == "FREE", "lock not released after the block exited")
  }

  test("readLocked holds a SHARED gate: excludes cross-process writers, admits readers") {
    val dir = lockPath("readgate")
    val gate = dir + ".read.lock"
    // inside readLocked: an exclusive probe (= another process's rename
    // window) must be excluded, a shared probe (= another process's
    // reader) must coexist; concurrent same-JVM readers must share ONE
    // OS lock (java.nio forbids same-JVM overlap) via the refcount
    val results = Artifacts.readLocked(dir) {
      Artifacts.readLocked(dir) { // same-JVM concurrent reader (nested)
        (probe(gate), probe(gate, "shared"))
      }
    }
    assert(results._1 == "HELD",
      s"an exclusive lock was acquirable during a locked read: $results")
    assert(results._2 == "FREE",
      s"a shared lock was NOT acquirable during a locked read: $results")
    assert(probe(gate) == "FREE", "read gate not released after the block")
  }

  test("writeThenSwap holds the swap lock across the whole refresh") {
    // probe DURING the staging write: a second process must already be
    // excluded there (it could otherwise overwrite the shared .compacting
    // dir mid-promote), and again right before the block returns; after
    // the swap the lock must be free
    val spark = TestSpark.spark
    val dir = lockPath("swapdemo")
    val f = new java.io.File(dir)
    if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
    spark.range(10).write.mode("overwrite").parquet(dir)
    var duringWrite = ""
    Artifacts.writeThenSwap(spark, dir) { tmp =>
      duringWrite = probe(dir + ".swap.lock")
      spark.range(20).write.mode("overwrite").parquet(tmp)
    }
    assert(duringWrite == "HELD",
      "a second process could acquire the swap lock during the staging write")
    assert(spark.read.parquet(dir).count() == 20)
    assert(probe(dir + ".swap.lock") == "FREE",
      "swap lock not released after the refresh")
  }

  test("writeThenSwap's rename window waits out a cross-process shared reader") {
    val spark = TestSpark.spark
    val dir = lockPath("swapwait")
    val f = new java.io.File(dir)
    if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
    spark.range(10).write.mode("overwrite").parquet(dir)
    // a second JVM holds the read gate SHARED for holdMs — the swap's
    // staging write may proceed but its rename pair must not complete
    // until the holder releases (otherwise a cross-process reader could
    // see a mid-rename directory)
    val holdMs = 6000L
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    def src(c: Class[_]) = new java.io.File(
      c.getProtectionDomain.getCodeSource.getLocation.toURI).getPath
    val cp = Seq(src(graft.tools.LockProbe.getClass),
      src(scala.Predef.getClass)).mkString(java.io.File.pathSeparator)
    val pb = new ProcessBuilder(javaBin, "-cp", cp, "graft.tools.LockProbe",
      dir + ".read.lock", "hold-shared", holdMs.toString)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    val first = reader.readLine()
    assert(first == "ACQUIRED", s"holder JVM failed to start: $first")
    val tHold = System.nanoTime()
    Artifacts.writeThenSwap(spark, dir) { tmp =>
      spark.range(20).write.mode("overwrite").parquet(tmp)
    }
    val elapsedMs = (System.nanoTime() - tHold) / 1e6
    proc.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
    assert(spark.read.parquet(dir).count() == 20)
    // the swap must have finished only after the holder released. A slow
    // staging write (> holdMs) would make this vacuously true — that is
    // fine (the discriminating case is the common fast write)
    assert(elapsedMs >= holdMs - 500,
      f"swap completed ${elapsedMs}%.0f ms after the shared hold started " +
        f"— the rename window did not wait for the $holdMs ms holder")
  }

  test("readers drain only for a DECLARED writer (gate intent), never against each other") {
    // r14 ADVICE: the old pure-age drain parked every new reader behind
    // any >5s sibling hold even with no writer anywhere. Now: with no
    // writer, a new reader piggybacks instantly on an in-flight hold of
    // any age; with a writer's .gate.intent held, a new reader parks
    // until the in-flight reads drain (which is what lets the writer's
    // exclusive acquisition win promptly).
    def readerHolding(dir: String, ms: Long): Thread = {
      val t = new Thread(() => Artifacts.readLocked(dir) { Thread.sleep(ms) })
      t.start(); Thread.sleep(200); t // let it acquire
    }
    // control: no writer — the second reader piggybacks immediately
    val free = lockPath("drainfree")
    val tFree = readerHolding(free, 1500)
    val e0 = System.nanoTime()
    Artifacts.readLocked(free) { () }
    val freeMs = (System.nanoTime() - e0) / 1e6
    tFree.join()
    assert(freeMs < 500,
      f"a reader drained with NO writer present ($freeMs%.0f ms)")
    // writer declared: a new reader parks until the intent clears —
    // including a FIRST reader (count == 0), or a sequential probe
    // stream whose refcount returns to 0 between probes would re-acquire
    // the gate ahead of the blocked exclusive forever (POSIX grants new
    // shared locks past blocked exclusive waiters)
    val busy = lockPath("drainbusy")
    val writer = new Thread(() =>
      Artifacts.withProcessLock(busy + ".gate.intent") { Thread.sleep(2200) })
    writer.start(); Thread.sleep(200) // intent held before any reader
    val e1 = System.nanoTime()
    Artifacts.readLocked(busy) { () } // first reader: no in-flight hold
    val busyMs = (System.nanoTime() - e1) / 1e6
    writer.join()
    assert(busyMs >= 1200,
      f"a first reader entered past a declared writer ($busyMs%.0f ms — " +
        "it must park until the intent clears)")
  }

  test("a FOREIGN process's gate intent parks readers too (cross-JVM writer detection)") {
    // the same-JVM case above exercises writerPlausible's procLocks fast
    // path; this one exercises the real cross-JVM mechanism — the
    // non-blocking SHARED tryLock probe of the intent file against
    // another process's exclusive hold
    val dir = lockPath("draincross")
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    def src(c: Class[_]) = new java.io.File(
      c.getProtectionDomain.getCodeSource.getLocation.toURI).getPath
    val cp = Seq(src(graft.tools.LockProbe.getClass),
      src(scala.Predef.getClass)).mkString(java.io.File.pathSeparator)
    val pb = new ProcessBuilder(javaBin, "-cp", cp, "graft.tools.LockProbe",
      dir + ".gate.intent", "hold-exclusive", "2200")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    assert(reader.readLine() == "ACQUIRED", "intent-holder JVM failed")
    val t0 = System.nanoTime()
    Artifacts.readLocked(dir) { () }
    val ms = (System.nanoTime() - t0) / 1e6
    proc.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
    assert(ms >= 1200,
      f"a reader entered past a FOREIGN process's intent ($ms%.0f ms)")
  }

  test("IVF maintenance is serialized across JVMs: a compact blocks while a foreign maintenance op runs") {
    // r15 verdict item 2: maintenance serialization (compact vs
    // recluster vs ingest) was a documented caller contract; the
    // .maintenance.lock makes it a mechanism. A second JVM holds the
    // store's maintenance lock (standing in for its recluster/ingest —
    // the lock, not the op, is the mechanism under test) and this JVM's
    // ivfCompact must not run its staging read, let alone promote,
    // until the foreign hold releases. Store contents afterwards prove
    // the blocked compact then ran to completion.
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    val path = lockPath("ivfmaint")
    for (suffix <- Seq("", ".tombstones")) {
      val f = new java.io.File(path + suffix)
      if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
    }
    val embs = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 64)
    val cs = Similarity.trainKmeansCentroids(embs, "embedding",
      k = 2, iters = 1)
    Similarity.materializedIvfIndex(embs, "vec_id", "embedding", cs, path)
    Similarity.ivfTombstone(spark, path, "vec_id",
      embs.filter(col("vec_id") < 8).select("vec_id"))
    val holdMs = 3000L
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    def src(c: Class[_]) = new java.io.File(
      c.getProtectionDomain.getCodeSource.getLocation.toURI).getPath
    val cp = Seq(src(graft.tools.LockProbe.getClass),
      src(scala.Predef.getClass)).mkString(java.io.File.pathSeparator)
    val pb = new ProcessBuilder(javaBin, "-cp", cp, "graft.tools.LockProbe",
      path + ".maintenance.lock", "hold-exclusive", holdMs.toString)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    assert(reader.readLine() == "ACQUIRED", "maintenance-holder JVM failed")
    val t0 = System.nanoTime()
    val remaining = Similarity.ivfCompact(spark, path)
    val ms = (System.nanoTime() - t0) / 1e6
    proc.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
    assert(ms >= holdMs - 500,
      f"ivfCompact finished $ms%.0f ms after the foreign maintenance hold " +
        f"started — it did not serialize behind the $holdMs ms holder")
    assert(remaining == 64 - 8,
      s"post-hold compact must fold the tombstones: $remaining rows")
  }

  test("generation stamp: a swap invalidates later locked readers' caches once") {
    val spark = TestSpark.spark
    val dir = lockPath("gendemo")
    val f = new java.io.File(dir)
    if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
    new java.io.File(dir + ".generation").delete()
    spark.range(10).write.mode("overwrite").parquet(dir)
    // no stamp yet: nothing to refresh
    assert(!Artifacts.refreshIfSwapped(spark, dir))
    Artifacts.writeThenSwap(spark, dir) { tmp =>
      spark.range(20).write.mode("overwrite").parquet(tmp)
    }
    assert(new java.io.File(dir + ".generation").exists(),
      "swap did not stamp a generation")
    // the swapping JVM already recorded the stamp as seen (it refreshed
    // its own caches in the window) — no double invalidation
    assert(!Artifacts.refreshIfSwapped(spark, dir))
    // simulate ANOTHER process's swap: replace the stamp out-of-band
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir + ".generation"), "other-jvm-swap")
    assert(Artifacts.refreshIfSwapped(spark, dir),
      "a foreign generation stamp must invalidate this JVM's caches")
    assert(!Artifacts.refreshIfSwapped(spark, dir),
      "the same stamp must invalidate only once")
    // the locked read itself serves the post-swap content
    val n = Artifacts.readLocked(spark, dir) {
      spark.read.parquet(dir).count()
    }
    assert(n == 20)
  }
}
