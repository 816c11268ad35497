package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ArtifactStore, ManifestArtifactStore, Similarity}

/** The object-store artifact protocol
  * ([[graft.operators.ManifestArtifactStore]]) — the [[ArtifactStore]]
  * seam's manifest impl, exercised by the SAME lifecycle code the POSIX
  * stores run: every step of the IVF lifecycle (build → ingest →
  * tombstone → compact/fold → delete → recluster) must serve
  * bit-identical answers from both protocols, the lease must exclude a
  * REAL second process, conditional-PUT admission must be exact under
  * racing tombstoners, and the one-generation snapshot grace must hold
  * and then expire as documented.
  */
class ManifestStoreSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): String = {
    val d = new java.io.File("/root/repo/target/indexes", name)
    if (d.exists()) org.apache.commons.io.FileUtils.deleteDirectory(d)
    for (suffix <- Seq(".tombstones", ".schema.json", ".artifact.json"))
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(d.getPath + suffix))
    d.getPath
  }

  /** A CHILD session (shared context, isolated SQLConf) with
    * `spark.graft.artifactStore = manifest` — suites run in parallel on
    * one SparkContext, so mutating the SHARED session's conf for a
    * multi-second build window would flip a concurrent suite's store
    * creation to the wrong protocol (r17 review). Only store CREATION
    * consults the conf; every later op sniffs the store's own layout.
    * Frames passed to the lifecycle ops must come from this session —
    * the ops read conf from `df.sparkSession`.
    */
  private def manifestSession(): org.apache.spark.sql.SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.graft.artifactStore", "manifest")
    s
  }

  private def topDirs(root: String, prefix: String): Seq[String] =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .map(_.getName)

  test("IVF lifecycle serves identically through the manifest and POSIX protocols") {
    val embs = Tables.t(spark, sf, "embeddings").filter(col("vec_id") < 96)
    val base = embs.filter(pmod(col("vec_id"), lit(2L)) === 0)
    val delta = embs.filter(pmod(col("vec_id"), lit(2L)) === 1)
    val cs = Similarity.trainKmeansCentroids(base, "embedding", k = 4,
      iters = 1)
    val q = embs.filter(col("vec_id") === 0L).select("embedding")
      .head().getSeq[Float](0)
    val pPosix = freshDir("ivf_seam_posix_v1")
    val pMani = freshDir("ivf_seam_manifest_v1")

    def probe(path: String, cents: Seq[Seq[Double]]): Seq[(Long, Double)] =
      Similarity.ivfStoreProbe(spark, path, "vec_id", "embedding", q,
          k = 10, cents, nprobe = cents.size)
        .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9) / 1e9))
        .toSeq
    def sameServe(cents: Seq[Seq[Double]], step: String): Unit = {
      val (a, b) = (probe(pPosix, cents), probe(pMani, cents))
      assert(a == b, s"$step: posix $a != manifest $b")
      assert(a.nonEmpty, s"$step returned no rows")
    }

    // BUILD — conf picks the protocol only here (child-session frame)
    Similarity.materializedIvfIndex(base, "vec_id", "embedding", cs, pPosix)
    val sM = manifestSession()
    val baseM = Tables.t(sM, sf, "embeddings")
      .filter(col("vec_id") < 96 && pmod(col("vec_id"), lit(2L)) === 0)
    Similarity.materializedIvfIndex(baseM, "vec_id", "embedding", cs, pMani)
    assert(ManifestArtifactStore.isManifestStore(pMani))
    assert(!ManifestArtifactStore.isManifestStore(pPosix))
    assert(topDirs(pMani, "gen-").size == 1, "build = one generation dir")
    assert(ManifestArtifactStore.kindOf(pMani).contains("ivf"))
    sameServe(cs, "build")

    // INGEST — sniffed, conf untouched: a new immutable segment
    Similarity.ivfIngest(delta, "embedding", cs, pPosix)
    Similarity.ivfIngest(delta, "embedding", cs, pMani)
    assert(topDirs(pMani, "seg-").size == 1, "ingest = one segment dir")
    sameServe(cs, "ingest")

    // TOMBSTONE — logical delete, served immediately on both
    val tombIds = embs.filter(pmod(col("vec_id"), lit(5L)) === 1)
      .select("vec_id")
    Similarity.ivfTombstone(spark, pPosix, "vec_id", tombIds)
    Similarity.ivfTombstone(spark, pMani, "vec_id", tombIds)
    assert(Similarity.pendingTombstoneRows(spark, pMani) ==
      Similarity.pendingTombstoneRows(spark, pPosix))
    assert(Similarity.pendingTombstoneRows(spark, pMani) > 0)
    sameServe(cs, "tombstone (logical serve)")

    // COMPACT — folds the tombstones physically on both protocols
    val nPosix = Similarity.ivfCompact(spark, pPosix)
    val nMani = Similarity.ivfCompact(spark, pMani)
    assert(nPosix == nMani, s"fold row counts: $nPosix vs $nMani")
    assert(Similarity.pendingTombstoneRows(spark, pMani) == 0L,
      "fold must clear the captured tombstone segments from the manifest")
    sameServe(cs, "compact/fold")

    // DELETE — the broadcast anti-join rewrite
    val delIds = embs.filter(pmod(col("vec_id"), lit(7L)) === 3)
      .select("vec_id")
    assert(Similarity.ivfDelete(spark, pPosix, "vec_id", delIds) ==
      Similarity.ivfDelete(spark, pMani, "vec_id", delIds))
    sameServe(cs, "delete")

    // RECLUSTER — deterministic retrain must land both stores in the
    // same layout; a FULL probe then equals brute force over kept rows
    val freshPosix = Similarity.ivfRecluster(spark, pPosix, "embedding",
      k = 3, iters = 1)
    val freshMani = Similarity.ivfRecluster(spark, pMani, "embedding",
      k = 3, iters = 1)
    assert(freshPosix == freshMani, "retrain must be deterministic")
    sameServe(freshMani, "recluster")
    val kept = embs
      .join(tombIds.withColumnRenamed("vec_id", "vec_id"), Seq("vec_id"),
        "left_anti")
      .join(delIds, Seq("vec_id"), "left_anti")
    val brute = Similarity.bruteForceTopK(kept, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getLong(0),
        math.round(r.getDouble(1) * 1e9) / 1e9)).toSeq
    assert(probe(pMani, freshMani) == brute,
      "full-probe manifest serve must equal brute force over kept rows")
  }

  test("layout sniff beats session conf in BOTH directions") {
    // the conf chooses the protocol only for CREATION; an existing
    // store's own layout governs every later op, whatever the session
    // says — one session must serve mixed-protocol estates
    import graft.operators.Dedup
    val docs = Tables.t(spark, sf, "documents").limit(32)
    val pPosix = freshDir("span_sniff_posix_v1")
    Dedup.spanCountsIngest(docs, "doc_id", "text", k = 8, pPosix) // posix
    val sM = manifestSession()
    val pMani = freshDir("span_sniff_manifest_v1")
    Dedup.spanCountsIngest(Tables.t(sM, sf, "documents").limit(32),
      "doc_id", "text", k = 8, pMani) // manifest
    // read the POSIX store from the manifest-conf session: sniff → posix
    assert(ArtifactStore.forPath(sM, pPosix) eq
      graft.operators.PosixArtifactStore)
    assert(ArtifactStore.readFrame(sM,
      ArtifactStore.forPath(sM, pPosix).snapshot(sM, pPosix)).count() > 0)
    // read the manifest store from the default-conf session: sniff wins
    assert(ArtifactStore.forPath(spark, pMani) eq
      graft.operators.ManifestArtifactStore)
    // and a MAINTENANCE op from the "wrong" session keeps the protocol:
    // a manifest-conf compact of the posix store must not leave a
    // _manifest dir, and vice versa
    Dedup.spanCountsCompact(sM, pPosix)
    assert(!ManifestArtifactStore.isManifestStore(pPosix),
      "compacting a POSIX store from a manifest-conf session must not " +
        "convert it")
    Dedup.spanCountsCompact(spark, pMani)
    assert(ManifestArtifactStore.isManifestStore(pMani))
  }

  test("manifest lease excludes a second PROCESS: compact blocks behind a foreign holder") {
    val embs = Tables.t(spark, sf, "embeddings").filter(col("vec_id") < 48)
    val cs = Similarity.trainKmeansCentroids(embs, "embedding", k = 2,
      iters = 1)
    val path = freshDir("ivf_seam_lease_v1")
    val sM = manifestSession()
    Similarity.materializedIvfIndex(
      Tables.t(sM, sf, "embeddings").filter(col("vec_id") < 48),
      "vec_id", "embedding", cs, path)
    Similarity.ivfTombstone(spark, path, "vec_id",
      embs.filter(col("vec_id") < 8).select("vec_id"))
    val holdMs = 3000L
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    def src(c: Class[_]) = new java.io.File(
      c.getProtectionDomain.getCodeSource.getLocation.toURI).getPath
    // the probe runs the REAL acquisition path, so it needs the engine
    // classes + scala-library; spark jars resolve the (exception-caught)
    // conf lookup inside leaseMs
    val cp = Seq(src(graft.tools.LeaseProbe.getClass),
      src(scala.Predef.getClass), "/opt/spark/jars/*")
      .mkString(java.io.File.pathSeparator)
    val pb = new ProcessBuilder(javaBin, "-cp", cp,
      "graft.tools.LeaseProbe", path, holdMs.toString)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    assert(reader.readLine() == "ACQUIRED", "lease-holder JVM failed")
    val t0 = System.nanoTime()
    val remaining = Similarity.ivfCompact(spark, path)
    val ms = (System.nanoTime() - t0) / 1e6
    proc.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
    assert(ms >= holdMs - 500,
      f"ivfCompact finished $ms%.0f ms after the foreign lease hold " +
        f"started — it did not serialize behind the $holdMs ms holder")
    assert(remaining == 48 - 8,
      s"post-hold compact must fold the tombstones: $remaining rows")
  }

  test("racing tombstoners admit EXACTLY to the cap (conditional-PUT admission)") {
    val embs = Tables.t(spark, sf, "embeddings").filter(col("vec_id") < 32)
    val cs = Similarity.trainKmeansCentroids(embs, "embedding", k = 2,
      iters = 1)
    val path = freshDir("ivf_seam_capcas_v1")
    val sM = manifestSession()
    Similarity.materializedIvfIndex(
      Tables.t(sM, sf, "embeddings").filter(col("vec_id") < 32),
      "vec_id", "embedding", cs, path)
    // the tightened cap lives on a CHILD session too — mutating the
    // shared session's cap would make a parallel suite's ivfTombstone
    // spuriously refuse (r17 review)
    val sCap = spark.newSession()
    sCap.conf.set("spark.graft.ivf.maxPendingTombstones", "3")
    val embsCap = Tables.t(sCap, sf, "embeddings").filter(col("vec_id") < 32)
    val admitted = new java.util.concurrent.atomic.AtomicInteger(0)
    val refused = new java.util.concurrent.atomic.AtomicInteger(0)
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val threads = (0 until 6).map { i =>
      new Thread(() => {
        try {
          Similarity.ivfTombstone(sCap, path, "vec_id",
            embsCap.filter(col("vec_id") === i.toLong).select("vec_id"))
          admitted.incrementAndGet(); ()
        } catch {
          case e: IllegalArgumentException
              if e.getMessage.contains("tombstones already pending") =>
            refused.incrementAndGet(); ()
          case t: Throwable => err.set(t)
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(err.get() == null, s"unexpected failure: ${err.get()}")
    // admission re-checks the COMMITTED manifest per CAS attempt, so
    // with 1-row batches against cap 3 exactly 3 commit (pending
    // 0, 1, 2) and the rest refuse — no overshoot, unlike a lock-free
    // check-then-append
    assert(admitted.get() == 3 && refused.get() == 3,
      s"admitted ${admitted.get()}, refused ${refused.get()}")
    assert(Similarity.pendingTombstoneRows(spark, path) == 3L)
  }

  test("conditional PUT excludes across REAL processes: one winner per version, full content") {
    // the manifest protocol's whole safety story reduces to one
    // primitive — PUT-if-absent with atomic full content. Same-JVM
    // threads cannot prove the OS-level claim (like flock for
    // LockProbe), so four FRESH JVMs race the same version file with
    // distinct contents: exactly one must win, and the visible file
    // must carry the winner's content byte-for-byte (a torn or merged
    // write would corrupt every reader's snapshot resolution)
    val dir = new java.io.File("/root/repo/target/indexes/cas_probe_spec_v1")
    if (dir.exists()) org.apache.commons.io.FileUtils.deleteDirectory(dir)
    val target = new java.io.File(dir, "_manifest/v00000002.json").getPath
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    def src(c: Class[_]) = new java.io.File(
      c.getProtectionDomain.getCodeSource.getLocation.toURI).getPath
    val cp = Seq(src(graft.tools.CasProbe.getClass),
      src(scala.Predef.getClass)).mkString(java.io.File.pathSeparator)
    val contents = (0 until 4).map(i => s"""{"writer":$i,"pad":"${"x" * 4096}"}""")
    val procs = contents.map { c =>
      val pb = new ProcessBuilder(javaBin, "-cp", cp,
        "graft.tools.CasProbe", target, c)
      pb.redirectErrorStream(true)
      pb.start()
    }
    val results = procs.map { p =>
      assert(p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
        "CasProbe JVM did not finish")
      new String(p.getInputStream.readAllBytes()).trim.linesIterator
        .toSeq.last
    }
    assert(results.count(_ == "WON") == 1 &&
      results.count(_ == "LOST") == 3, s"results: $results")
    val winner = contents(results.indexOf("WON"))
    val visible = java.nio.file.Files.readString(
      java.nio.file.Paths.get(target))
    assert(visible == winner,
      "the visible version file must be the winner's FULL content")
  }

  test("snapshot grace: a resolved snapshot survives one replace, expires after two") {
    import graft.operators.Dedup
    val docs = Tables.t(spark, sf, "documents").limit(64)
    val path = freshDir("span_seam_grace_v1")
    val sM = manifestSession()
    val docsM = Tables.t(sM, sf, "documents").limit(64)
    Dedup.spanCountsIngest(docsM, "doc_id", "text", k = 8, path)
    Dedup.spanCountsIngest(docsM, "doc_id", "text", k = 8, path)
    val store = ArtifactStore.forPath(spark, path)
    val snap1 = store.snapshot(spark, path)
    val n1 = ArtifactStore.readFrame(spark, snap1).count()
    assert(n1 > 0)
    // age grace off on a CHILD session (gc reads the caller's conf):
    // test the REFERENCE grace alone, without mutating the shared conf
    val sG = spark.newSession()
    sG.conf.set("spark.graft.artifact.gcGraceMs", "0")
    // replace #1: snap1's segments are referenced by the PREVIOUS
    // manifest — the one-generation grace — so the old snapshot still
    // reads (this is what lets a lock-free reader finish mid-compact)
    Dedup.spanCountsCompact(sG, path)
    assert(ArtifactStore.readFrame(spark, snap1).count() == n1,
      "snapshot must survive one replace (grace window)")
    // replace #2: snap1 now referenced by NEITHER kept manifest — its
    // directories are collected, exactly the documented expiry
    Dedup.spanCountsCompact(sG, path)
    assert(snap1.dataPaths.forall(p => !new java.io.File(p).exists()),
      "two replaces past a snapshot must collect its directories")
  }

  test("the SAME lifecycle matrix runs through a file:/// Hadoop-FS URI (binding proof)") {
    // r17 verdict item 1: the manifest protocol's primitives bind to
    // org.apache.hadoop.fs.FileSystem resolved from the root URI. A
    // file:/// root exercises the Hadoop binding end-to-end (list, read,
    // mkdirs, rmTree, staging, GC, lease) while the CAS primitives route
    // back to the hard-link emulation the CasProbe test proves — the
    // documented file:// binding. Serve equality against a plain-path
    // POSIX twin at every lifecycle step is the same gate the original
    // protocol test uses.
    val embs = Tables.t(spark, sf, "embeddings").filter(col("vec_id") < 96)
    val base = embs.filter(pmod(col("vec_id"), lit(2L)) === 0)
    val delta = embs.filter(pmod(col("vec_id"), lit(2L)) === 1)
    val cs = Similarity.trainKmeansCentroids(base, "embedding", k = 4,
      iters = 1)
    val q = embs.filter(col("vec_id") === 0L).select("embedding")
      .head().getSeq[Float](0)
    val local = freshDir("ivf_hadoop_uri_v1")
    val uri = "file://" + local
    val pPosix = freshDir("ivf_hadoop_posix_twin_v1")

    // the URI itself selects the manifest protocol — a DEFAULT-conf
    // session, no spark.graft.artifactStore flip anywhere
    assert(ArtifactStore.forPath(spark, uri) eq ManifestArtifactStore)

    def probe(path: String, cents: Seq[Seq[Double]]): Seq[(Long, Double)] =
      Similarity.ivfStoreProbe(spark, path, "vec_id", "embedding", q,
          k = 10, cents, nprobe = cents.size)
        .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9) / 1e9))
        .toSeq
    def sameServe(cents: Seq[Seq[Double]], step: String): Unit = {
      val (a, b) = (probe(pPosix, cents), probe(uri, cents))
      assert(a == b, s"$step: posix $a != hadoop-uri $b")
      assert(a.nonEmpty, s"$step returned no rows")
    }

    Similarity.materializedIvfIndex(base, "vec_id", "embedding", cs, pPosix)
    Similarity.materializedIvfIndex(base, "vec_id", "embedding", cs, uri)
    assert(new java.io.File(local, "_manifest").isDirectory,
      "the Hadoop binding must have written the manifest log to the " +
        "same local tree the URI names")
    assert(ManifestArtifactStore.isManifestStore(uri))
    assert(ManifestArtifactStore.kindOf(uri).contains("ivf"))
    sameServe(cs, "build")

    Similarity.ivfIngest(delta, "embedding", cs, pPosix)
    Similarity.ivfIngest(delta, "embedding", cs, uri)
    assert(topDirs(local, "seg-").size == 1, "ingest = one segment dir")
    sameServe(cs, "ingest")

    val tombIds = embs.filter(pmod(col("vec_id"), lit(5L)) === 1)
      .select("vec_id")
    Similarity.ivfTombstone(spark, pPosix, "vec_id", tombIds)
    Similarity.ivfTombstone(spark, uri, "vec_id", tombIds)
    // footer math over URI tombstone segment paths — parquetFilesUnder
    // through the Hadoop binding
    assert(Similarity.pendingTombstoneRows(spark, uri) ==
      Similarity.pendingTombstoneRows(spark, pPosix))
    assert(Similarity.pendingTombstoneRows(spark, uri) > 0)
    sameServe(cs, "tombstone (logical serve)")

    assert(Similarity.ivfCompact(spark, pPosix) ==
      Similarity.ivfCompact(spark, uri))
    assert(Similarity.pendingTombstoneRows(spark, uri) == 0L)
    sameServe(cs, "compact/fold")

    val delIds = embs.filter(pmod(col("vec_id"), lit(7L)) === 3)
      .select("vec_id")
    assert(Similarity.ivfDelete(spark, pPosix, "vec_id", delIds) ==
      Similarity.ivfDelete(spark, uri, "vec_id", delIds))
    sameServe(cs, "delete")

    val freshPosix = Similarity.ivfRecluster(spark, pPosix, "embedding",
      k = 3, iters = 1)
    val freshUri = Similarity.ivfRecluster(spark, uri, "embedding",
      k = 3, iters = 1)
    assert(freshPosix == freshUri, "retrain must be deterministic")
    sameServe(freshUri, "recluster")
    val kept = embs
      .join(tombIds, Seq("vec_id"), "left_anti")
      .join(delIds, Seq("vec_id"), "left_anti")
    val brute = Similarity.bruteForceTopK(kept, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getLong(0),
        math.round(r.getDouble(1) * 1e9) / 1e9)).toSeq
    assert(probe(uri, freshUri) == brute,
      "full-probe hadoop-uri serve must equal brute force over kept rows")
  }

  test("lease renewal: a LIVE holder with a short leaseMs is never stolen from") {
    // r17 verdict item 2 (renewal half): leaseMs SHORTER than the
    // maintenance body — the heartbeat must keep renewing so a foreign
    // process's acquisition loop never observes an expired lease. The
    // foreign waiter is a REAL second JVM running the production
    // acquisition path; without renewal it would steal ~leaseMs into
    // the hold.
    import graft.operators.Dedup
    val path = freshDir("span_lease_renew_v1")
    val sM = manifestSession()
    Dedup.spanCountsIngest(Tables.t(sM, sf, "documents").limit(32),
      "doc_id", "text", k = 8, path)
    val store = ArtifactStore.forPath(spark, path)
    val sShort = spark.newSession()
    sShort.conf.set("spark.graft.artifact.leaseMs", "400")
    val holdMs = 3000L
    val entered = new java.util.concurrent.CountDownLatch(1)
    val bodyDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val holder = new Thread(() => {
      try store.maintenanceLocked(sShort, path) {
        entered.countDown()
        Thread.sleep(holdMs)
        bodyDone.set(true)
      } catch { case t: Throwable => err.set(t); entered.countDown() }
    })
    holder.start()
    assert(entered.await(30, java.util.concurrent.TimeUnit.SECONDS))
    assert(err.get() == null, s"holder failed to acquire: ${err.get()}")
    val t0 = System.nanoTime()
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    def src(c: Class[_]) = new java.io.File(
      c.getProtectionDomain.getCodeSource.getLocation.toURI).getPath
    val cp = Seq(src(graft.tools.LeaseProbe.getClass),
      src(scala.Predef.getClass), "/opt/spark/jars/*")
      .mkString(java.io.File.pathSeparator)
    val proc = new ProcessBuilder(javaBin, "-cp", cp,
      "graft.tools.LeaseProbe", path, "1").start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    assert(reader.readLine() == "ACQUIRED", "waiter JVM failed")
    // boot-time-proof assertion (r18 review pass 2: a wall-clock
    // threshold could be masked by slow probe-JVM boot): if renewal is
    // broken, the waiter steals the 400 ms lease and ACQUIRED prints
    // while the holder's 3 s body is still sleeping — bodyDone false.
    // With renewal, the waiter can only acquire after the holder's
    // release, which happens-after the body's last statement.
    assert(bodyDone.get(),
      "foreign waiter acquired while the holder's body was still " +
        "running — the short lease was stolen from a LIVE holder " +
        "(renewal broken)")
    val ms = (System.nanoTime() - t0) / 1e6 // informational
    holder.join(30000)
    proc.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
    assert(err.get() == null, s"holder body failed: ${err.get()}")
    info(f"waiter acquired $ms%.0f ms after probe launch (hold $holdMs ms)")
  }

  test("claim-by-replace steal: two stealer JVMs racing a dead holder's expired lease never overlap") {
    // r18 verdict item 3: the steal is ONE conditional replace of the
    // expired content, so a losing stealer never issues a delete that
    // could land on the winner's fresh claim. Three-JVM shape: the dead
    // holder is an expired lease file written directly (a crashed JVM's
    // leftover — renewal only stops while the holder lives), and two
    // REAL stealer JVMs run the production acquisition loop. Mutual
    // exclusion is proven ON DISK, not by timing: each holder claims a
    // create-new token while it holds; a pre-existing token = two
    // concurrent maintenance bodies = exactly the corruption the old
    // delete-then-put steal admitted.
    import graft.operators.Dedup
    val path = freshDir("span_steal_race_v1")
    val sM = manifestSession()
    Dedup.spanCountsIngest(Tables.t(sM, sf, "documents").limit(16),
      "doc_id", "text", k = 8, path)
    val lf = java.nio.file.Paths.get(path, "_manifest", "lease")
    java.nio.file.Files.writeString(lf,
      s"deadbeef-crashed ${System.currentTimeMillis() - 60000}")
    val token = new java.io.File(path + ".steal_token")
    org.apache.commons.io.FileUtils.deleteQuietly(token)
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    def src(c: Class[_]) = new java.io.File(
      c.getProtectionDomain.getCodeSource.getLocation.toURI).getPath
    val cp = Seq(src(graft.tools.StealProbe.getClass),
      src(scala.Predef.getClass), "/opt/spark/jars/*")
      .mkString(java.io.File.pathSeparator)
    val procs = (1 to 2).map { _ =>
      val pb = new ProcessBuilder(javaBin, "-cp", cp,
        "graft.tools.StealProbe", path, "1500", token.getPath)
      pb.redirectErrorStream(true)
      pb.start()
    }
    val outputs = procs.map { p =>
      assert(p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "StealProbe JVM did not finish")
      new String(p.getInputStream.readAllBytes()).trim
        .linesIterator.toSeq
    }
    assert(outputs.forall(_.contains("HELD")) &&
      outputs.forall(_.contains("DONE")) &&
      !outputs.exists(_.contains("VIOLATION")),
      s"steal race violated mutual exclusion: $outputs")
    assert(!java.nio.file.Files.exists(lf),
      "both stealers released cleanly — no orphaned claim")
    assert(!token.exists())
    // the primitive itself, deterministically: N same-JVM threads race
    // ONE replace of the same expired content — exactly one may win
    java.nio.file.Files.writeString(lf,
      s"deadbeef-crashed2 ${System.currentTimeMillis() - 60000}")
    val expiredContent = java.nio.file.Files.readString(lf)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        if (graft.operators.LocalManifestFs.replaceIfContent(
            lf.toString, expiredContent, s"claim-$i fresh"))
          { wins.incrementAndGet(); () }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() == 1,
      s"claim-by-replace must admit exactly one winner, got ${wins.get()}")
    java.nio.file.Files.delete(lf)
  }

  test("publish fencing: a holder stalled past a stolen lease aborts without publishing") {
    // r17 verdict item 2 (fencing half): renewal cannot cover a holder
    // whose WHOLE JVM stalls past leaseMs (heartbeat included). Simulate
    // the aftermath — the lease now carries a stealer's claim — and
    // require every publish in the stalled body to abort loudly with
    // NOTHING committed; two bodies never both publish.
    import graft.operators.Dedup
    val path = freshDir("span_fence_v1")
    val sM = manifestSession()
    val docsM = Tables.t(sM, sf, "documents").limit(32)
    Dedup.spanCountsIngest(docsM, "doc_id", "text", k = 8, path)
    val store = ArtifactStore.forPath(spark, path)
    def versions(): Seq[String] =
      Option(new java.io.File(path, "_manifest").listFiles()).toSeq.flatten
        .map(_.getName).filter(_.matches("v\\d{8,}\\.json")).sorted
    val lf = java.nio.file.Paths.get(path, "_manifest", "lease")
    store.maintenanceLocked(spark, path) {
      val before = versions()
      // the steal, as a stalled holder would find it: our claim replaced
      // by a live foreign one
      java.nio.file.Files.delete(lf)
      java.nio.file.Files.writeString(lf,
        s"deadbeef-foreign ${System.currentTimeMillis() + 600000}")
      val ex = intercept[IllegalStateException] {
        // re-enters the (re-entrant) maintenance lock, stages, publishes
        // — the fence must fire at the publish
        Dedup.spanCountsIngest(docsM, "doc_id", "text", k = 8, path)
      }
      assert(ex.getMessage.contains("stolen"), ex.getMessage)
      assert(versions() == before,
        "a fenced-out body must not have committed any manifest version")
    }
    // the conditional release must NOT have deleted the stealer's claim
    assert(java.nio.file.Files.readString(lf).startsWith("deadbeef-foreign "),
      "exiting the fenced body must leave the stealer's lease intact")
    java.nio.file.Files.delete(lf) // clean up the simulated stealer
  }

  test("pinned snapshot survives replaces until unpin; expired pins are collected") {
    // r17 verdict item 3: pinSnapshot writes a pin file the GC respects,
    // with its own age bound — for reads spanning more than the
    // one-generation grace the plain snapshot test locks.
    import graft.operators.Dedup
    val path = freshDir("span_pin_v1")
    val sM = manifestSession()
    val docsM = Tables.t(sM, sf, "documents").limit(64)
    Dedup.spanCountsIngest(docsM, "doc_id", "text", k = 8, path)
    Dedup.spanCountsIngest(docsM, "doc_id", "text", k = 8, path)
    val store = ArtifactStore.forPath(spark, path)
    val (pinId, snap) = store.pinSnapshot(spark, path)
    val n = ArtifactStore.readFrame(spark, snap).count()
    assert(n > 0)
    val bits = ArtifactStore.readFrame(spark, snap)
      .collect().map(_.toString).sorted.toSeq
    val sG = spark.newSession()
    sG.conf.set("spark.graft.artifact.gcGraceMs", "0")
    // two replaces: WITHOUT the pin this exact sequence collects the
    // snapshot's dirs (the grace-expiry test above proves it)
    Dedup.spanCountsCompact(sG, path)
    Dedup.spanCountsCompact(sG, path)
    assert(snap.dataPaths.forall(p => new java.io.File(p).exists()),
      "a pinned snapshot's directories must survive two replaces")
    assert(ArtifactStore.readFrame(spark, snap)
      .collect().map(_.toString).sorted.toSeq == bits,
      "a pinned snapshot must serve bit-identically across replaces")
    store.unpin(path, pinId)
    Dedup.spanCountsCompact(sG, path)
    assert(snap.dataPaths.forall(p => !new java.io.File(p).exists()),
      "after unpin the snapshot's directories are ordinary GC candidates")
    // expired pin: the age bound is what stops a dead reader's pin from
    // leaking directories forever — GC deletes the pin file itself too
    val sP = spark.newSession()
    sP.conf.set("spark.graft.artifact.pinMaxAgeMs", "0")
    val (pinId2, snap2) = store.pinSnapshot(sP, path)
    Dedup.spanCountsCompact(sG, path)
    Dedup.spanCountsCompact(sG, path)
    assert(snap2.dataPaths.forall(p => !new java.io.File(p).exists()),
      "an EXPIRED pin must not protect its snapshot")
    assert(!new java.io.File(new java.io.File(path, "_manifest"),
      s"pin-$pinId2.json").exists(),
      "GC must delete the expired pin file")
    // POSIX stores mutate in place: pinning is impossible and says so
    val pPosix = freshDir("span_pin_posix_v1")
    Dedup.spanCountsIngest(Tables.t(spark, sf, "documents").limit(16),
      "doc_id", "text", k = 8, pPosix)
    intercept[UnsupportedOperationException] {
      ArtifactStore.forPath(spark, pPosix).pinSnapshot(spark, pPosix)
    }
  }

  test("a failed op on a never-built path leaves no trace — the sniff cannot flip") {
    // r18 review pass 1: acquiring the lease materializes _manifest/
    // before the body can vet store existence, so a failed compact of a
    // never-built path used to leave an empty _manifest (sniff flips to
    // manifest for every later op) or at least a root dir (a fresh
    // posix-conf creation would sniff-flip to posix). The release now
    // cleans lock residue off a never-published store.
    val path = freshDir("never_built_noop_v1")
    val sM = manifestSession()
    intercept[IllegalStateException] {
      Similarity.ivfCompact(sM, path) // requireStore throws inside
    }
    assert(!new java.io.File(path).exists(),
      "a failed op must not leave a root dir behind")
    // creation at that path afterwards still follows the session conf
    assert(ArtifactStore.forPath(spark, path) eq
      graft.operators.PosixArtifactStore)
    assert(ArtifactStore.forPath(sM, path) eq ManifestArtifactStore)
  }

  test("leaseMs reads the CALLER session's conf, not SparkSession.active") {
    // r18 ADVICE: a conf-isolated child session's leaseMs must govern
    // its own maintenance ops, exactly like gcGraceMs — the lease file's
    // expiry proves which conf was read
    import graft.operators.Dedup
    val path = freshDir("span_leasems_conf_v1")
    val sM = manifestSession()
    Dedup.spanCountsIngest(Tables.t(sM, sf, "documents").limit(16),
      "doc_id", "text", k = 8, path)
    val store = ArtifactStore.forPath(spark, path)
    val sIso = spark.newSession()
    sIso.conf.set("spark.graft.artifact.leaseMs", "123456")
    store.maintenanceLocked(sIso, path) {
      val t = System.currentTimeMillis()
      val content = java.nio.file.Files.readString(
        java.nio.file.Paths.get(path, "_manifest", "lease"))
      val expiry = content.split(" ")(1).toLong
      assert(expiry - t <= 123456 && expiry - t > 60000,
        s"lease expiry ${expiry - t} ms out — the child session's " +
          "123456 ms was not the value read (default 600000?)")
    }
  }

  test("span-count store serves identically through both protocols") {
    import graft.operators.Dedup
    val docs = Tables.t(spark, sf, "documents").limit(128)
    val pPosix = freshDir("span_seam_posix_v1")
    val pMani = freshDir("span_seam_manifest_v1")
    for (_ <- 1 to 3) Dedup.spanCountsIngest(docs, "doc_id", "text", 8, pPosix)
    val sM = manifestSession()
    val docsM = Tables.t(sM, sf, "documents").limit(128)
    for (_ <- 1 to 3) Dedup.spanCountsIngest(docsM, "doc_id", "text", 8, pMani)
    assert(topDirs(pMani, "seg-").size == 3, "one segment per ingest batch")
    def serve(path: String): Seq[(Long, String, Long, Long)] =
      Dedup.spanDedupServe(docs, "doc_id", "text", path, k = 8, minCount = 3)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSeq.sortBy(_._1)
    assert(serve(pPosix) == serve(pMani), "pre-compact serves must match")
    assert(Dedup.spanCountsCompact(spark, pPosix) ==
      Dedup.spanCountsCompact(spark, pMani))
    assert(serve(pPosix) == serve(pMani), "post-compact serves must match")
    assert(ManifestArtifactStore.kindOf(pMani).contains("span_store"))
  }

  test("MIGRATE clones a store faithfully across protocols, both directions") {
    val embs = Tables.t(spark, sf, "embeddings").filter(col("vec_id") < 96)
    val cs = Similarity.trainKmeansCentroids(embs, "embedding", k = 4,
      iters = 1)
    val q = embs.filter(col("vec_id") === 0L).select("embedding")
      .head().getSeq[Float](0)
    val src = freshDir("ivf_migrate_src_v1")
    val dstLocal = freshDir("ivf_migrate_dst_v1")
    val dst = "file://" + dstLocal
    val back = freshDir("ivf_migrate_back_v1")
    // stale .migration_ok markers from earlier JVM runs are deliberately
    // NOT hand-deleted: migrate clears a stale marker itself when the
    // destination is absent (review pass)

    def probe(path: String, cents: Seq[Seq[Double]]): Seq[(Long, Double)] =
      Similarity.ivfStoreProbe(spark, path, "vec_id", "embedding", q,
          k = 10, cents, nprobe = cents.size)
        .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9) / 1e9))
        .toSeq

    // POSIX source: base + appended segment + PENDING tombstones
    Similarity.materializedIvfIndex(
      embs.filter(pmod(col("vec_id"), lit(2L)) === 0),
      "vec_id", "embedding", cs, src)
    Similarity.ivfIngest(embs.filter(pmod(col("vec_id"), lit(2L)) === 1),
      "embedding", cs, src)
    Similarity.ivfTombstone(spark, src, "vec_id",
      embs.filter(pmod(col("vec_id"), lit(5L)) === 1).select("vec_id"))
    val srcServe = probe(src, cs)
    assert(srcServe.nonEmpty)

    // posix → manifest over the file:/// Hadoop binding, via the SQL verb
    val parser = new graft.plans.GraftSqlParser(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.sqlParser)
    val row = parser
      .parsePlan(s"MIGRATE GRAFT ARTIFACT FROM '$src' TO '$dst'")
      .asInstanceOf[graft.plans.MigrateGraftArtifactCommand].run(spark).head
    assert(row.getString(0) == "ivf" && row.getString(3) == "manifest")
    assert(ManifestArtifactStore.isManifestStore(dstLocal))
    assert(ArtifactStore.forPath(spark, dst).kindOf(dst).contains("ivf"))
    // faithful clone: serve equality INCLUDING the carried pending
    // tombstones; the serving partition layout is re-applied
    assert(probe(dst, cs) == srcServe, "migrated serve must match source")
    // carried distinct: equal here (the source batch held distinct ids);
    // a duplicated source batch would carry FEWER rows, same logic
    assert(Similarity.pendingTombstoneRows(spark, dst) ==
      Similarity.pendingTombstoneRows(spark, src))
    assert(Similarity.pendingTombstoneRows(spark, dst) > 0)
    val gen = topDirs(dstLocal, "gen-").head
    assert(topDirs(new java.io.File(dstLocal, gen).getPath,
      "g_ivf_bucket=").nonEmpty, "Hive partition layout must be re-applied")
    // the SQL verb registers the destination for graft_artifacts/ADVISE
    assert(graft.plans.QueryHistory.artifactsSnapshot
      .exists { case (k, p) =>
        k == "ivf" && p == graft.cube.CubeCatalog.normalizePath(dst) })
    // source untouched and still serving
    assert(!ManifestArtifactStore.isManifestStore(src))
    assert(probe(src, cs) == srcServe)

    // manifest → posix brings it back; the clone keeps cloning. The
    // manifest SOURCE is pinned for the copy (readers never block
    // maintenance there) and the pin must be released afterwards
    ArtifactStore.migrate(spark, dst, back, Some("posix"))
    assert(Option(new java.io.File(dstLocal, "_manifest").listFiles())
      .toSeq.flatten.forall(f => !f.getName.startsWith("pin-")),
      "the migration's source pin must be released in its finally")
    assert(!ManifestArtifactStore.isManifestStore(back))
    assert(ArtifactStore.forPath(spark, back).kindOf(back).contains("ivf"))
    assert(probe(back, cs) == srcServe, "round trip must serve identically")
    // maintenance on the migrated store works under its NEW protocol:
    // the fold clears the carried tombstones and the serve is unchanged
    Similarity.ivfCompact(spark, back)
    assert(Similarity.pendingTombstoneRows(spark, back) == 0L)
    assert(probe(back, cs) == srcServe)

    // re-running a COMPLETED migration is an idempotent no-op (the
    // completion marker records the source)
    assert(ArtifactStore.migrate(spark, src, dst) == "ivf")
    assert(probe(dst, cs) == srcServe)

    // refusals: same root; a different source into a migrated
    // destination; a destination with data but NO completion marker
    // (the crashed-mid-carry window — pending deletes may be missing);
    // posix through a URI
    intercept[IllegalArgumentException] {
      ArtifactStore.migrate(spark, src, src + "/")
    }
    intercept[IllegalArgumentException] {
      ArtifactStore.migrate(spark, back, dst)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(back + ".migration_ok"))
    val noMarker = intercept[IllegalArgumentException] {
      ArtifactStore.migrate(spark, dst, back, Some("posix"))
    }
    assert(noMarker.getMessage.contains("no migration marker"))
    intercept[IllegalArgumentException] {
      ArtifactStore.migrate(spark, src, "file:///tmp/never_built_x",
        Some("posix"))
    }
    // URI spellings of the SAME root and nested roots refuse — a
    // manifest store built inside a live POSIX source would destroy it
    intercept[IllegalArgumentException] {
      ArtifactStore.migrate(spark, src, "file:" + src)
    }
    intercept[IllegalArgumentException] {
      ArtifactStore.migrate(spark, src, src + "/sub")
    }

    // a RETIRED destination's stale marker must not poison the root:
    // delete the store but leave the marker; migrating a DIFFERENT
    // source there clears the leftover and proceeds (review pass)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dstLocal))
    assert(ArtifactStore.migrate(spark, back, dst) == "ivf")
    assert(probe(dst, cs) == srcServe)
    // the marker now records the NEW source: its re-run is the no-op,
    // the old source refuses
    assert(ArtifactStore.migrate(spark, back, dst) == "ivf")
    intercept[IllegalArgumentException] {
      ArtifactStore.migrate(spark, src, dst)
    }
  }

  test("PIN/UNPIN SQL twins pin and release a manifest snapshot") {
    val embs = Tables.t(spark, sf, "embeddings").filter(col("vec_id") < 32)
    val cs = Similarity.trainKmeansCentroids(embs, "embedding", k = 2,
      iters = 1)
    val root = freshDir("ivf_pin_sql_v1")
    val sM = manifestSession()
    val embsM = Tables.t(sM, sf, "embeddings").filter(col("vec_id") < 32)
    Similarity.materializedIvfIndex(embsM, "vec_id", "embedding", cs, root)
    val parser = new graft.plans.GraftSqlParser(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.sqlParser)
    val pin = parser.parsePlan(s"PIN GRAFT ARTIFACT '$root'")
      .asInstanceOf[graft.plans.PinGraftArtifactCommand].run(spark).head
    val pinId = pin.getString(0)
    // the pin resolves from id alone (durable, cross-process by design)
    val snap = ManifestArtifactStore.resolvePin(spark, root, pinId)
    assert(snap.dataPaths.nonEmpty)
    parser.parsePlan(s"UNPIN GRAFT ARTIFACT '$root' ID '$pinId'")
      .asInstanceOf[graft.plans.UnpinGraftArtifactCommand].run(spark)
    intercept[IllegalStateException] {
      ManifestArtifactStore.resolvePin(spark, root, pinId)
    }
    // POSIX stores refuse the pin with the documented message
    val pPosix = freshDir("ivf_pin_sql_posix_v1")
    Similarity.materializedIvfIndex(embs, "vec_id", "embedding", cs, pPosix)
    intercept[UnsupportedOperationException] {
      parser.parsePlan(s"PIN GRAFT ARTIFACT '$pPosix'")
        .asInstanceOf[graft.plans.PinGraftArtifactCommand].run(spark)
    }
  }

  test("migration marker protocol: in-flight claims refuse, completion is CAS'd, roots and cased schemes refuse") {
    // r19 ADVICE: (1) a dst-absent migrate must NOT clear a live
    // `state=copying` claim — a manifest destination does not exist
    // until the final publish, so the whole copy runs dst-absent and a
    // second migrate clearing the claim would interleave two
    // migrations' data/tombstones; (2) completion must be a CAS replace
    // of the claim, never an ignored put; (3) URI schemes compare
    // case-insensitively in the same/nested-root refusal; (4) root
    // destinations refuse (the sibling marker has no parent there).
    val embs = Tables.t(spark, sf, "embeddings").filter(col("vec_id") < 32)
    val cs = Similarity.trainKmeansCentroids(embs, "embedding", k = 2,
      iters = 1)
    val src = freshDir("ivf_migrate_claims_src_v1")
    Similarity.materializedIvfIndex(embs, "vec_id", "embedding", cs, src)
    val dstLocal = freshDir("ivf_migrate_claims_dst_v1")
    val marker = new java.io.File(dstLocal + ".migration_ok")
    org.apache.commons.io.FileUtils.deleteQuietly(marker)
    // (1) destination ABSENT + a copying claim (from ANY source)
    val claim = "src=/somewhere/else state=copying"
    java.nio.file.Files.writeString(marker.toPath, claim)
    val inFlight = intercept[IllegalArgumentException] {
      ArtifactStore.migrate(spark, src, dstLocal)
    }
    assert(inFlight.getMessage.contains("in flight"), inFlight.getMessage)
    assert(java.nio.file.Files.readString(marker.toPath) == claim,
      "the refusal must leave the in-flight claim untouched")
    org.apache.commons.io.FileUtils.deleteQuietly(marker)
    // (3) a CASED scheme spelling of the same/nested root still refuses
    intercept[IllegalArgumentException] {
      ArtifactStore.migrate(spark, src, "FILE:" + src)
    }
    intercept[IllegalArgumentException] {
      ArtifactStore.migrate(spark, src, "FILE://" + src + "/sub")
    }
    // (4) filesystem/bucket-root destinations refuse before any I/O
    val rootRefusal = intercept[IllegalArgumentException] {
      ArtifactStore.migrate(spark, src, "hdfs://namenode/")
    }
    assert(rootRefusal.getMessage.contains("root"), rootRefusal.getMessage)
    // (2) a successful migrate ends with the claim CAS-replaced by the
    // completion form — same file, no marker-absent window in between
    ArtifactStore.migrate(spark, src, dstLocal)
    assert(java.nio.file.Files.readString(marker.toPath).trim == s"src=$src",
      "completion must rewrite the claim to the done form in place")
  }

  test("MIGRATE carries a fully-emptied store's schema (empty clone plans)") {
    val embs = Tables.t(spark, sf, "embeddings").filter(col("vec_id") < 32)
    val cs = Similarity.trainKmeansCentroids(embs, "embedding", k = 2,
      iters = 1)
    val src = freshDir("ivf_migrate_empty_src_v1")
    val dstLocal = freshDir("ivf_migrate_empty_dst_v1")
    Similarity.materializedIvfIndex(embs, "vec_id", "embedding", cs, src)
    Similarity.ivfDelete(spark, src, "vec_id", embs.select("vec_id"))
    assert(Similarity.readStore(spark, src).count() == 0L)
    ArtifactStore.migrate(spark, src, "file://" + dstLocal)
    val served = Similarity.readStore(spark, "file://" + dstLocal)
    assert(served.count() == 0L, "empty clone must plan and serve 0 rows")
    assert(served.columns.contains("vec_id"),
      "the persisted schema must survive the migration")
  }

  test("remote two-stealer race: the sequenced cell admits exactly one winner where no flock exists") {
    // r19 ADVICE (medium) / r19 verdict item 2: on the local binding the
    // flock sibling serializes the steal's compare+swap, so the original
    // two-stealer race never exercised the remote path — where
    // replaceIfContent was read-compare-then-overwrite and two stealers
    // could BOTH win. The lease now runs on the putIfAbsent-sequenced
    // CAS cell, so the same three-JVM shape through the ADVERSARIAL
    // object store (no flock, rename overwrites silently, objects land
    // at close) must show zero overlap, proven on-disk by the
    // create-new token exactly like the local test.
    val scheme = "stealfs"
    val backing = "/root/repo/target/indexes/steal_backing"
    val store = "steal_race_remote_v1"
    val bucketDir = new java.io.File(backing, "bucket")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(bucketDir, store))
    val root = s"$scheme://bucket/$store"
    val confPairs = Seq(
      s"fs.$scheme.impl=graft.tools.ObjectStoreFs",
      s"fs.$scheme.impl.disable.cache=true",
      s"fs.$scheme.graft.fake.root=$backing",
      s"fs.$scheme.graft.fake.mode=conditional",
      s"fs.graft.cas.$scheme=create")
    // the dead holder: an EXPIRED claim seeded as cell version 1,
    // written through the backing dir exactly like a crashed JVM's
    // leftover object
    val cellDir = new java.io.File(bucketDir, s"$store/_manifest/lease")
    cellDir.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(cellDir, "c0000000001").toPath,
      s"deadbeef-crashed ${System.currentTimeMillis() - 60000}")
    val token = new java.io.File(backing + ".steal_token")
    org.apache.commons.io.FileUtils.deleteQuietly(token)
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getPath
    def src(c: Class[_]) = new java.io.File(
      c.getProtectionDomain.getCodeSource.getLocation.toURI).getPath
    val cp = Seq(src(graft.tools.StealProbe.getClass),
      src(scala.Predef.getClass), "/opt/spark/jars/*")
      .mkString(java.io.File.pathSeparator)
    val procs = (1 to 2).map { _ =>
      val pb = new ProcessBuilder(
        (Seq(javaBin, "-cp", cp, "graft.tools.StealProbe", root, "1500",
          token.getPath) ++ confPairs): _*)
      pb.redirectErrorStream(true)
      pb.start()
    }
    val outputs = procs.map { p =>
      assert(p.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "StealProbe JVM did not finish")
      new String(p.getInputStream.readAllBytes()).trim
        .linesIterator.toSeq
    }
    assert(outputs.forall(_.contains("HELD")) &&
      outputs.forall(_.contains("DONE")) &&
      !outputs.exists(_.contains("VIOLATION")),
      s"remote steal race violated mutual exclusion: $outputs")
    assert(!token.exists())
    // clean release: the cell's top version is the tombstone sentinel
    // (remote cells delete by advancing, never by removing files a
    // racing claim could be landing next to)
    val versions = Option(cellDir.listFiles()).toSeq.flatten
      .map(_.getName).filter(_.matches("c\\d{10,}")).sorted
    assert(versions.size >= 4, s"expected seeded+2 claims+releases, got $versions")
    assert(java.nio.file.Files.readString(
        new java.io.File(cellDir, versions.last).toPath)
      == "__graft_cell_deleted__",
      "both stealers released cleanly — the cell top must be the tombstone")

    // the primitive itself, deterministically: 8 same-JVM threads race
    // ONE cellReplaceIf of the same expired content through the Hadoop
    // binding (no flock anywhere on this path) — exactly one may win
    val c = new org.apache.hadoop.conf.Configuration()
    confPairs.foreach { kv =>
      val i = kv.indexOf('='); c.set(kv.substring(0, i), kv.substring(i + 1))
    }
    val cell2 = s"$scheme://bucket/$store/_manifest/primitive_race"
    val expired = s"deadbeef-crashed2 ${System.currentTimeMillis() - 60000}"
    graft.operators.ManifestFs.withHadoopConf(c) {
      assert(graft.operators.HadoopManifestFs.cellPutIfAbsent(cell2, expired))
    }
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 8).map { i =>
      new Thread(() => graft.operators.ManifestFs.withHadoopConf(c) {
        if (graft.operators.HadoopManifestFs.cellReplaceIf(
            cell2, expired, s"claim-$i fresh"))
          { wins.incrementAndGet(); () }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() == 1,
      s"sequenced-cell replace must admit exactly one winner, got ${wins.get()}")
  }
}
