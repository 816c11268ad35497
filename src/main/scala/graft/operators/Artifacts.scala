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
    * mid-rename miss or a torn listing. The read/write lock is in-JVM;
    * across JVMs both directions are OS mechanisms: writer–writer via
    * the exclusive `.swap.lock` [[writeThenSwap]] holds across the whole
    * refresh, reader–writer via the `.read.lock` gate ([[readLocked]]
    * readers hold it SHARED, the rename window takes it exclusively).
    * Build-once per content-tagged path remains the belt-and-braces
    * discipline on top. These mechanics are the POSIX protocol of the
    * [[ArtifactStore]] seam; a multi-driver deployment on an object
    * store (no flock, no atomic rename) selects the manifest protocol
    * instead ([[ManifestArtifactStore]]: immutable generations published
    * by conditional PUT), where none of the locks below exist because
    * in-place mutation — the problem they solve — is designed out.
    */
  private val swapLocks = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.locks.ReentrantReadWriteLock]()

  /** Per-path state for [[withProcessLock]]: the JVM-wide owner thread and
    * re-entrancy depth of the OS file lock (java.nio `FileLock`s are held
    * per-JVM and a second acquisition from the same JVM throws
    * `OverlappingFileLockException`, so same-JVM callers must queue here
    * and re-entrant callers must not re-acquire).
    */
  private final class ProcLock {
    var holder: Thread = null
    var depth = 0
    var channel: java.nio.channels.FileChannel = null
    var osLock: java.nio.channels.FileLock = null
  }
  private val procLocks =
    new java.util.concurrent.ConcurrentHashMap[String, ProcLock]()

  /** Run `f` under an OS-level ADVISORY lock on `lockPath` (created if
    * absent): at most one process — and within it one thread — holds the
    * lock at a time, and a crashed holder's lock is released by the OS,
    * so no stale-lockfile cleanup exists. Re-entrant per thread (the
    * recluster cycle takes the store's build lock and then calls
    * [[materializedIvfIndex]]-style builders that take it again). This is
    * what makes the build-once-per-content-tagged-path discipline an
    * INVARIANT across concurrent driver JVMs (gate runner + bench racing
    * the FIRST build of a shared artifact) rather than a convention; it
    * is still advisory — a process that writes the artifact without
    * taking the lock is not stopped.
    */
  def withProcessLock[T](lockPath: String)(f: => T): T = {
    val p = java.nio.file.Paths.get(lockPath).toAbsolutePath.normalize()
    val st = procLocks.computeIfAbsent(p.toString, _ => new ProcLock)
    val me = Thread.currentThread()
    // claim same-JVM ownership first, then take the OS lock OUTSIDE the
    // monitor: other threads of this JVM park in st.wait() (interruptible)
    // instead of blocking uninterruptibly at monitor-enter for as long as
    // another PROCESS holds the file lock
    val firstEntry = st.synchronized {
      while (st.holder != null && st.holder != me) st.wait()
      if (st.holder == me) { st.depth += 1; false }
      else { st.holder = me; st.depth = 1; true }
    }
    if (firstEntry) {
      def unclaim(): Unit = st.synchronized {
        st.holder = null; st.depth = 0; st.notifyAll()
      }
      try {
        Option(p.getParent)
          .foreach(d => java.nio.file.Files.createDirectories(d))
        val ch = java.nio.channels.FileChannel.open(p,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        // blocks until any OTHER JVM's holder releases; this JVM's claim
        // above guarantees no same-JVM overlap (which would throw)
        val l = try ch.lock() catch {
          case t: Throwable => ch.close(); throw t
        }
        st.synchronized { st.channel = ch; st.osLock = l }
      } catch { case t: Throwable => unclaim(); throw t }
    }
    try f finally st.synchronized {
      st.depth -= 1
      if (st.depth == 0) {
        // release-then-close as separate guarantees: a throwing release
        // must not leak the fd (a leaked still-locked channel would make
        // every later acquisition throw OverlappingFileLockException)
        try { try st.osLock.release() finally st.channel.close() }
        finally {
          st.holder = null; st.osLock = null; st.channel = null
          st.notifyAll()
        }
      }
    }
  }

  /** Serialize a WHOLE maintenance body (build / ingest append / compact
    * / delete / recluster) of the artifact at `destDir` against every
    * other maintenance body, across driver JVMs — the OS lock one level
    * above the swap lock (order, outermost first: maintenance → build →
    * swap → rw → gate intent → read gate). Without it the serialization
    * is a caller contract, and e.g. an ingest's appended file can land in
    * the old directory after a compaction's staging read — renamed aside
    * and deleted with it when the compaction promotes. Serving reads
    * never take it (they go through [[readLocked]] and wait only for the
    * rename window), so probes never park behind a long rewrite.
    */
  def maintenanceLocked[T](destDir: String)(f: => T): T =
    withProcessLock(destDir.stripSuffix("/") + ".maintenance.lock")(f)

  // normalize() resolves "." and ".." so two spellings of one directory
  // share one lock (getAbsolutePath would leave "a/../a" distinct);
  // symlinked spellings are out of scope — artifacts live under
  // target/indexes and are addressed by their literal build path
  private def normKey(destDir: String): String =
    java.nio.file.Paths.get(destDir.stripSuffix("/"))
      .toAbsolutePath.normalize().toString

  private def lockFor(destDir: String) =
    swapLocks.computeIfAbsent(normKey(destDir),
      _ => new java.util.concurrent.locks.ReentrantReadWriteLock())

  /** Generation stamp each artifact dir last showed THIS JVM's locked
    * readers (see [[refreshIfSwapped]]).
    */
  private val seenGenerations =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Cross-JVM post-swap cache freshness: [[writeThenSwap]] stamps a
    * `.generation` sibling (atomic move) inside its exclusive window,
    * and invalidates its OWN Spark listing/dir-cost caches — but it
    * cannot reach another process's caches, and Spark's file-status
    * cache would otherwise keep serving the deleted old generation's
    * listing there. A locked reader that observes a stamp it has not
    * seen invalidates this JVM's caches before planning. Returns
    * whether it invalidated.
    */
  /** Serializes check-invalidate-record in [[refreshIfSwapped]] PER
    * ARTIFACT: a reader must not record a stamp as seen until the
    * invalidation for it has COMPLETED, or a concurrent reader could
    * skip its own invalidation and plan against the stale listing.
    * Per-key monitors so probes of unrelated stores never contend on
    * the stamp's file I/O.
    */
  private val genMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Write a fresh generation stamp for `destDir` (unique temp +
    * `ATOMIC_MOVE`, so a concurrent reader of the stamp file never sees
    * a torn write) and return it. The caller decides when to record it
    * as seen by this JVM.
    */
  private def writeGenerationStamp(destDir: String): String = {
    val gen = java.util.UUID.randomUUID().toString
    val genTmp = java.nio.file.Paths
      .get(destDir.stripSuffix("/") + s".generation.$gen.tmp")
    java.nio.file.Files.writeString(genTmp, gen)
    java.nio.file.Files.move(genTmp,
      java.nio.file.Paths.get(destDir.stripSuffix("/") + ".generation"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    gen
  }

  /** Stamp a fresh `.generation` for `destDir` and refresh THIS JVM's
    * listing/dir-cost caches — the cross-JVM freshness signal for
    * mutations that change an artifact's FILE SET without a swap (e.g.
    * [[graft.operators.Similarity.ivfIngest]]'s append): a locked
    * reader in another process observes the new stamp on its next probe
    * and invalidates its own caches ([[refreshIfSwapped]]); without it,
    * a foreign reader's cached pre-append listing would silently miss
    * the appended rows until the next [[writeThenSwap]]. Runs under the
    * artifact's generation monitor so a concurrent same-JVM reader
    * cannot record this stamp as seen before the invalidation lands.
    */
  private[graft] def stampGeneration(spark: SparkSession,
                                     destDir: String): Unit =
    genMonitors.computeIfAbsent(normKey(destDir), _ => new Object)
      .synchronized {
      val gen = writeGenerationStamp(destDir)
      seenGenerations.put(normKey(destDir), gen)
      org.apache.spark.sql.graft.FileListingCache.invalidateAll(spark)
      org.apache.spark.sql.graft.ScanBytes.invalidateDirCosts()
    }

  private[graft] def refreshIfSwapped(spark: SparkSession,
                                      destDir: String): Boolean =
    genMonitors.computeIfAbsent(normKey(destDir), _ => new Object)
      .synchronized {
      val genFile = java.nio.file.Paths
        .get(destDir.stripSuffix("/") + ".generation")
      val gen =
        if (java.nio.file.Files.exists(genFile))
          java.nio.file.Files.readString(genFile)
        else ""
      val prev = seenGenerations.get(normKey(destDir))
      // prev == null with a stamp present means a swap happened before
      // this JVM ever locked-read the artifact — an earlier UNLOCKED read
      // may have cached the pre-swap listing: invalidate once,
      // conservatively
      val changed = if (prev == null) gen.nonEmpty else prev != gen
      if (changed) {
        org.apache.spark.sql.graft.FileListingCache.invalidateAll(spark)
        org.apache.spark.sql.graft.ScanBytes.invalidateDirCosts()
      }
      seenGenerations.put(normKey(destDir), gen) // only AFTER invalidating
      changed
    }

  /** Refcounted SHARED OS lock per lock file (the read side of
    * [[readLocked]]'s cross-JVM gate): java.nio forbids overlapping
    * locks within one JVM — even shared ones — so all of this JVM's
    * concurrent readers ride ONE shared `FileLock`, acquired by the
    * first in and released by the last out. The channel is opened once
    * per gate path and kept (entries live for the JVM anyway), so a
    * sequential probe stream pays one `lock`/`release` pair per cycle,
    * not an open/close. The OS acquisition itself runs OUTSIDE the
    * monitor — sibling readers park interruptibly in `wait()` while the
    * first reader waits out another process's exclusive hold.
    *
    * Starvation bound: POSIX locks have no writer preference, and a
    * back-to-back reader stream piggybacking on the refcount would keep
    * the gate shared forever while a swap waits. New readers therefore
    * park the moment a writer DECLARES ITSELF — [[writeThenSwapThen]]
    * holds a `.gate.intent` lock around exactly its gate acquisition +
    * rename pair, and [[writerPlausible]] probes it (non-blocking,
    * result cached [[WriterCheckCacheNanos]]) — and keep parking until
    * the intent clears, so the writer's wait is bounded by the reads
    * already in flight (plus one cache interval of stragglers), and
    * writer-free read concurrency never degrades (the r14 pure-age
    * drain parked readers behind any slow sibling probe even with no
    * writer anywhere). The window itself is still best-effort — POSIX
    * grants the freed lock to whichever waiter the kernel picks — but a
    * reader that raced the grant re-parks on the still-held intent, so
    * in practice the writer wins every drain.
    */
  private final class SharedLock {
    var count = 0
    var acquiring = false // a first reader is taking the OS lock
    // per-thread hold depth: a thread already inside (nested readLocked,
    // or a reader calling back into a locked read) must piggyback
    // unconditionally — parking it at the drain point would deadlock on
    // its own hold
    val holders = new java.util.HashMap[Thread, Integer]()
    var channel: java.nio.channels.FileChannel = null
    var osLock: java.nio.channels.FileLock = null
    var lastWriterCheck = 0L // nanoTime of the last intent probe
    var writerSeen = false // its cached result
  }
  private val sharedLocks =
    new java.util.concurrent.ConcurrentHashMap[String, SharedLock]()

  /** How long one intent-probe result is reused before re-checking. */
  private val WriterCheckCacheNanos = 250L * 1000 * 1000

  /** True when a swap of this gate's artifact is plausibly at (or
    * approaching) its rename window: the sibling `.gate.intent` lock is
    * held — by a thread of this JVM ([[procLocks]] fast path, no I/O)
    * or by another process (non-blocking `tryLock` probe; our instant
    * exclusive acquisition on a FREE intent file is released
    * immediately and only delays a real writer's blocking `lock()` by
    * microseconds). Probing the intent rather than the `.swap.lock` is
    * load-bearing: the swap lock is held across the whole STAGING
    * write, which readers must coexist with — draining on it would
    * park every reader for the full rewrite. Called under the
    * [[SharedLock]] monitor (serializes same-file probes, which would
    * otherwise throw `OverlappingFileLockException` at each other);
    * the I/O is non-blocking and cached, so siblings are never held up
    * behind a slow probe.
    */
  private def writerPlausible(st: SharedLock, gateKey: String): Boolean = {
    val now = System.nanoTime()
    if (now - st.lastWriterCheck < WriterCheckCacheNanos) return st.writerSeen
    st.lastWriterCheck = now
    val intent = gateKey.stripSuffix(".read.lock") + ".gate.intent"
    val local = procLocks.get(intent)
    st.writerSeen =
      if (local != null && local.synchronized(local.holder != null)) true
      else {
        val ip = java.nio.file.Paths.get(intent)
        if (!java.nio.file.Files.exists(ip)) false // no writer ever swapped
        else {
          val ch = java.nio.channels.FileChannel.open(ip,
            java.nio.file.StandardOpenOption.READ,
            java.nio.file.StandardOpenOption.WRITE)
          try {
            // SHARED probe: concurrent reader JVMs probing the same free
            // intent must coexist (an exclusive probe would make them
            // read each other as writers for a cache interval); a real
            // writer's EXCLUSIVE intent hold still denies it
            val l = try ch.tryLock(0L, Long.MaxValue, true) catch {
              // this JVM holds (or is mid-acquiring) the intent on
              // another channel — a writer, by definition
              case _: java.nio.channels.OverlappingFileLockException =>
                null
            }
            if (l == null) true else { l.release(); false }
          } finally ch.close()
        }
      }
    st.writerSeen
  }

  private def acquireShared(lockPath: String): Unit = {
    val p = java.nio.file.Paths.get(lockPath).toAbsolutePath.normalize()
    val st = sharedLocks.computeIfAbsent(p.toString, _ => new SharedLock)
    val me = Thread.currentThread()
    val reuse = st.synchronized {
      val mine: Integer = st.holders.getOrDefault(me, 0)
      if (mine > 0) { // re-entrant: never drain against yourself
        st.count += 1; st.holders.put(me, mine + 1); return
      }
      var claimed = false
      while (!claimed) {
        // timed wait: a parked drainer must re-probe the intent even if
        // no release/acquire event notifies it (the writer may have
        // crashed, releasing the intent at the OS with nobody to notify).
        // FIRST readers (count == 0) drain too: POSIX grants a new
        // shared lock even past a BLOCKED exclusive waiter, so a
        // sequential probe stream whose count returns to 0 between
        // probes would otherwise starve the writer indefinitely — the
        // intent is what makes the writer's turn a mechanism
        if (st.acquiring || writerPlausible(st, p.toString))
          st.wait(1000) // drain for a writer / in-flight acquire
        else if (st.count > 0) {
          st.count += 1; st.holders.put(me, 1); return
        }
        else { st.acquiring = true; claimed = true }
      }
      st.channel // cached open channel from a previous cycle, or null
    }
    def unclaim(): Unit = st.synchronized {
      st.acquiring = false; st.notifyAll()
    }
    try {
      val ch =
        if (reuse != null) reuse
        else {
          Option(p.getParent)
            .foreach(d => java.nio.file.Files.createDirectories(d))
          java.nio.channels.FileChannel.open(p,
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.READ,
            java.nio.file.StandardOpenOption.WRITE)
        }
      // shared = true: other processes' readers coexist, another
      // process's EXCLUSIVE hold (a rename window) blocks us here
      val l = try ch.lock(0L, Long.MaxValue, true) catch {
        case t: Throwable =>
          // a failed/interrupted lock() CLOSES the channel (it is an
          // InterruptibleChannel) — never leave a dead channel cached,
          // or every later probe on this artifact throws forever
          st.synchronized { if (st.channel eq ch) st.channel = null }
          try ch.close() catch { case _: Throwable => () }
          throw t
      }
      st.synchronized {
        st.channel = ch; st.osLock = l; st.count = 1
        st.holders.put(me, 1)
        st.acquiring = false; st.notifyAll()
      }
    } catch { case t: Throwable => unclaim(); throw t }
  }

  private def releaseShared(lockPath: String): Unit = {
    val p = java.nio.file.Paths.get(lockPath).toAbsolutePath.normalize()
    val st = sharedLocks.get(p.toString)
    val me = Thread.currentThread()
    st.synchronized {
      st.count -= 1
      val mine: Integer = st.holders.getOrDefault(me, 0)
      if (mine <= 1) st.holders.remove(me) else st.holders.put(me, mine - 1)
      try {
        if (st.count == 0) {
          val l = st.osLock
          st.osLock = null
          try l.release()
          catch { case t: Throwable =>
            // a failed release may leave the OS lock on the cached
            // channel — drop the channel so the next cycle opens fresh
            // instead of throwing OverlappingFileLockException forever
            try st.channel.close() finally st.channel = null
            throw t
          }
        }
      } finally st.notifyAll() // wake drained readers / in-flight waiters
    }
  }

  /** Run `f` (listing + read + materialize) against one consistent
    * generation of the artifact at `destDir`: any concurrent
    * [[writeThenSwap]] rename window waits until `f` finishes, and `f`
    * waits out any in-flight window — in THIS JVM via the artifact's
    * read/write lock, and across JVMs via a SHARED OS lock on the
    * `.read.lock` sibling that the rename window takes exclusively
    * (readers in other processes coexist; a swapping process excludes
    * them only for the rename pair, not the staging write). Lock order
    * is everywhere rw-lock → read gate, so the two layers cannot
    * deadlock. Keep `f` to the serve itself — the locks serialize
    * against maintenance, not against other readers.
    */
  def readLocked[T](destDir: String)(f: => T): T = {
    val l = lockFor(destDir).readLock()
    l.lock()
    try {
      val gate = destDir.stripSuffix("/") + ".read.lock"
      acquireShared(gate)
      try f finally releaseShared(gate)
    } finally l.unlock()
  }

  /** [[readLocked]] plus cross-JVM cache freshness: before `f` plans
    * anything, the reader checks the artifact's `.generation` stamp and
    * invalidates this JVM's listing/dir-cost caches if another process
    * swapped the directory since the last locked read
    * ([[refreshIfSwapped]]). The serve entry points over shared stores
    * ([[graft.operators.Similarity.ivfStoreProbe]]) use this form.
    */
  def readLocked[T](spark: SparkSession, destDir: String)(f: => T): T =
    readLocked(destDir) {
      refreshIfSwapped(spark, destDir)
      f
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
    * The ENTIRE refresh — staging write into the shared `.compacting`
    * sibling AND the rename pair — holds the OS advisory lock on a
    * `.swap.lock` sibling ([[withProcessLock]]), so two JVMs racing
    * maintenance of the same directory fully serialize at the OS: the
    * loser cannot overwrite the winner's staging dir mid-promote, let
    * alone interleave the renames. Same-JVM readers are NOT blocked by
    * the long staging write (they take only the read side of the rw
    * lock, which the swap acquires just for the rename window).
    * Callers still serialize maintenance against ingest, as with every
    * artifact refresh here. Invalidates the listing and dir-cost caches
    * (inside the lock) so post-swap reads and prices see the new files.
    */
  def writeThenSwap(spark: SparkSession, destDir: String)
                   (write: String => Unit): Unit =
    writeThenSwapThen(spark, destDir)(write)(())

  /** [[writeThenSwap]] with a post-promote hook: `afterPromote` runs
    * INSIDE the exclusive read-gate window, after the renames and cache
    * invalidation — the place for sidecar mutations that must be atomic
    * with the swap from a locked reader's point of view (e.g.
    * [[graft.operators.Similarity.ivfCompact]] clearing the tombstone
    * files its rewrite folded: a reader must see tombstones+old store
    * or no-tombstones+new store, never a mix).
    */
  def writeThenSwapThen(spark: SparkSession, destDir: String)
                       (write: String => Unit)
                       (afterPromote: => Unit): Unit =
    withProcessLock(destDir.stripSuffix("/") + ".swap.lock") {
      val tmp = destDir.stripSuffix("/") + ".compacting"
      val old = destDir.stripSuffix("/") + ".precompact"
      write(tmp)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      val l = lockFor(destDir).writeLock()
      l.lock()
      // the rename pair additionally takes the read gate EXCLUSIVELY:
      // [[readLocked]] readers in OTHER processes hold it shared, so a
      // cross-JVM probe racing this window sees a whole generation too —
      // the reader-writer contract is a mechanism in both directions.
      // Lock order matches the readers' (rw lock, then gate): no cycle.
      // The `.gate.intent` wrapper DECLARES the writer to foreign
      // readers' drain probes (acquireShared's writerPlausible) for
      // exactly the gate-acquisition + rename span — held any wider
      // (e.g. riding the swap lock) it would park readers for the whole
      // staging write they are meant to coexist with. NOTE the accepted
      // in-JVM cost: this JVM's write lock is held ACROSS the gate
      // acquisition, so same-JVM readers are excluded not just for the
      // rename pair but also while foreign in-flight reads drain
      // (bounded by those reads plus one writerPlausible cache
      // interval — new foreign readers park on the intent). Taking the
      // gate BEFORE the write lock would instead deadlock: a same-JVM
      // reader holding the rw read lock blocks on the gate we hold,
      // while we block on the rw write lock it holds.
      try withProcessLock(destDir.stripSuffix("/") + ".gate.intent") {
        withProcessLock(destDir.stripSuffix("/") + ".read.lock") {
          rm(new java.io.File(old)) // stale recovery copy of a crashed run
          // stamp the new generation so OTHER processes' locked readers
          // invalidate their own caches on next probe — BEFORE the
          // renames: a crash between a completed promote and a later
          // stamp would leave foreign caches permanently stale, while a
          // stamp with no promote only costs readers one harmless
          // re-list of the unchanged directory
          val gen = writeGenerationStamp(destDir)
          require(new java.io.File(destDir).renameTo(new java.io.File(old)),
            s"could not stage $destDir -> $old")
          require(new java.io.File(tmp).renameTo(new java.io.File(destDir)),
            s"could not promote $tmp -> $destDir " +
              s"(previous artifact preserved at $old)")
          rm(new java.io.File(old))
          // this JVM records the stamp as seen (its caches refresh below)
          seenGenerations.put(normKey(destDir), gen)
          org.apache.spark.sql.graft.FileListingCache.invalidateAll(spark)
          org.apache.spark.sql.graft.ScanBytes.invalidateDirCosts()
          afterPromote
        }
      } finally l.unlock()
    }
}
