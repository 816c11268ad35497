package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** One consistent view of a materialized artifact: the directories (or
  * files) a reader scans, the persisted schema (a fully-emptied store has
  * no files to infer from), and the tombstone sidecar paths pending a
  * fold. POSIX stores resolve to the store root itself; manifest stores
  * resolve to the immutable generation/segment directories the current
  * manifest names.
  */
final case class ArtifactSnapshot(
    dataPaths: Seq[String],
    schema: Option[StructType],
    tombstonePaths: Seq[String])

/** The artifact-lifecycle seam (r16 verdict item 1): every maintenance
  * verb the IVF / span-count / pair-index stores need, behind one trait,
  * so the SAME lifecycle code runs on two storage protocols:
  *
  *   - [[PosixArtifactStore]] (default): the flock + atomic-rename
  *     mechanics of [[Artifacts]] — correct on any POSIX filesystem
  *     shared by the driver JVMs (local disk, NFS), where advisory file
  *     locks and atomic directory renames exist.
  *   - [[ManifestArtifactStore]]: the object-store protocol. A 100-TB
  *     deployment lives on S3/GCS/HDFS, where flock does not exist and
  *     rename is not atomic; there, writers stage IMMUTABLE generation /
  *     segment directories and publish by writing a tiny manifest with a
  *     conditional PUT (PUT-if-absent on a monotonically-versioned
  *     manifest log — the public Delta-log pattern), readers resolve the
  *     manifest and never list mutable directories, and maintenance
  *     mutual exclusion is a lease claimed by the same conditional PUT.
  *
  * Which impl serves a path is SNIFFED from the store's own layout (a
  * `_manifest/` directory marks a manifest store), so a session can read
  * stores built under either protocol regardless of its conf; NEW stores
  * are created under `spark.graft.artifactStore` (`posix` | `manifest`,
  * default `posix`).
  *
  * Reference analog: the reference's segment lifecycle is delegated to
  * Druid's coordinator/ZK (`DruidMetadataCache` consumes it); this engine
  * owns its artifacts, so it owns their publication protocol too.
  */
trait ArtifactStore {
  def name: String

  /** Whether a built artifact exists at `root`. */
  def exists(root: String): Boolean

  /** The durable artifact kind ("ivf", "span_store", "pair_index"),
    * persisted by the first mutating op — what
    * `REGISTER GRAFT ARTIFACT FROM '<path>'` reads so a FRESH session's
    * registry can re-attach existing stores.
    */
  def kindOf(root: String): Option[String]

  /** Serialize a WHOLE maintenance body (build / ingest append / compact
    * / delete / recluster) against every other maintenance body across
    * driver JVMs. POSIX: an OS advisory lock. Manifest: a lease file
    * claimed by conditional PUT (see [[ManifestArtifactStore]]).
    * Re-entrant per thread. Serving reads never take it.
    */
  def maintenanceLocked[T](root: String)(f: => T): T

  /** Point-in-time view of the artifact — the unlocked form the pressure
    * / ADVISE surfaces use (may race mutations; missing files there read
    * as zero by the callers' contract).
    */
  def snapshot(spark: SparkSession, root: String): ArtifactSnapshot

  /** Run `f` against ONE consistent generation. POSIX: the shared read
    * gate + rw lock of [[Artifacts.readLocked]] (the directory mutates in
    * place, so readers must exclude the rename window). Manifest: no lock
    * at all — generations are immutable and the manifest resolution IS
    * the snapshot; a concurrent publish cannot disturb `f` (its dirs
    * survive one full maintenance generation before GC — the grace
    * window every snapshot table format has).
    */
  def readLocked[T](spark: SparkSession, root: String)
                   (f: ArtifactSnapshot => T): T

  /** Build the artifact EXACTLY ONCE per root across racing driver JVMs:
    * `write(dir)` produces the initial contents; the loser of the race
    * observes the winner's build and writes nothing. Persists the
    * inferred schema and `kind`.
    */
  def buildOnce(spark: SparkSession, root: String, kind: String)
               (write: String => Unit): Unit

  /** Append files to the artifact (streamed ingest): `write(dir)` adds
    * data under `dir`. POSIX: appends into the root and stamps the
    * generation so foreign readers' listing caches refresh. Manifest:
    * writes a fresh immutable segment directory and publishes it —
    * foreign readers need no invalidation because every path they ever
    * scan is immutable. Maintenance-serialized internally.
    */
  def append(spark: SparkSession, root: String, kind: String)
            (write: String => Unit): Unit

  /** Replace the artifact's contents (compact / delete / recluster):
    * `write(captured, dir)` reads the CAPTURED snapshot and writes the
    * full replacement under `dir`, returning the schema to persist (a
    * full fold writes an empty replacement, on which inference would
    * throw). `foldCaptured = true` additionally clears EXACTLY the
    * captured tombstone sidecars, atomically with the publication from a
    * locked reader's view — a reader sees tombstones+old contents or
    * no-tombstones+new contents, never a mix. Callers hold
    * [[maintenanceLocked]] (both impls' locks are re-entrant).
    */
  def replace(spark: SparkSession, root: String, foldCaptured: Boolean)
             (write: (ArtifactSnapshot, String) => StructType): Unit

  /** Tombstone-sidecar append with an admission check: `check(snap)`
    * vets the CURRENT committed pending set (throwing refuses the batch)
    * and `write(dir)` appends the batch's ids under `dir`. Never parks
    * behind a long maintenance rewrite. POSIX: check+write serialize
    * under the store's read gate + an exclusive `.tombstones.lock`
    * (admission is exact up to one in-flight batch per caller).
    * Manifest: the batch is written once to a fresh segment and admitted
    * by conditional PUT — the check re-runs against the committed
    * manifest on every CAS attempt, so N racing tombstoners admit
    * EXACTLY to the cap with no overshoot.
    */
  def tombstoneAppend(spark: SparkSession, root: String)
                     (check: ArtifactSnapshot => Unit)
                     (write: String => Unit): Unit
}

object ArtifactStore {

  /** Resolve the store protocol for `root`: existing stores self-describe
    * (a `_manifest/` directory marks a manifest store; any other existing
    * directory is a POSIX store), fresh paths follow
    * `spark.graft.artifactStore`. Sniffing means a session can SERVE
    * stores of either protocol regardless of its conf — the conf only
    * chooses the protocol of stores it CREATES.
    */
  def forPath(spark: SparkSession, root: String): ArtifactStore =
    if (ManifestArtifactStore.isManifestStore(root)) ManifestArtifactStore
    else if (new java.io.File(root).isDirectory) PosixArtifactStore
    else spark.conf.get("spark.graft.artifactStore", "posix") match {
      case "manifest" => ManifestArtifactStore
      case "posix"    => PosixArtifactStore
      case other => throw new IllegalArgumentException(
        s"spark.graft.artifactStore must be posix or manifest, got $other")
    }

  /** Read one snapshot as a DataFrame, with its persisted schema when
    * present (a fully-emptied store has no files to infer from). Each
    * data path is its own scan, unioned: a manifest snapshot's segments
    * are sibling directories each carrying the full Hive-partition
    * layout, which a single multi-path read rejects as conflicting
    * (partition discovery wants ONE base path). Predicate pushdown sends
    * partition filters into every child scan, so bucket pruning is
    * unchanged; a compacted store is back to one scan.
    */
  def readFrame(spark: SparkSession, snap: ArtifactSnapshot): DataFrame = {
    def one(p: String): DataFrame = snap.schema match {
      case Some(sc) => spark.read.schema(sc).parquet(p)
      case None     => spark.read.parquet(p)
    }
    snap.dataPaths.map(one).reduce(_.unionAll(_))
  }

  /** Parquet data files under `path` (recursing into partition
    * subdirectories), or `path` itself when it IS a file — tombstone
    * snapshots carry files (POSIX) or segment dirs (manifest) and the
    * footer math must serve both.
    */
  private[graft] def parquetFilesUnder(path: String): Seq[java.io.File] = {
    val f = new java.io.File(path)
    if (f.isFile) Seq(f)
    else Option(f.listFiles()).toSeq.flatten.flatMap { c =>
      if (c.isDirectory) parquetFilesUnder(c.getPath)
      else if (c.getName.endsWith(".parquet") &&
        !c.getName.startsWith("_") && !c.getName.startsWith(".")) Seq(c)
      else Nil
    }
  }

  /** Footer row count of one parquet file; 0 when the file has vanished
    * (an UNLOCKED snapshot racing a fold — the vanished file's rows were
    * just folded, so 0 is the correct contribution).
    */
  private[graft] def footerRecordCount(f: java.io.File,
      conf: org.apache.hadoop.conf.Configuration): Long =
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getPath), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    } catch { case _: java.io.FileNotFoundException => 0L }

  /** Footer-metadata row total over the given paths — no Spark job. */
  private[graft] def footerRows(spark: SparkSession,
                                paths: Seq[String]): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    paths.flatMap(parquetFilesUnder).map(footerRecordCount(_, conf)).sum
  }
}

/** The default protocol: [[Artifacts]]' flock + atomic-rename mechanics
  * on a POSIX filesystem shared by the driver JVMs. The store root IS the
  * data directory (mutated in place under the lock discipline documented
  * on [[Artifacts]]); sidecars sit beside it (`<root>.schema.json`,
  * `<root>.tombstones/`, `<root>.artifact.json`, and the lock /
  * generation files).
  */
object PosixArtifactStore extends ArtifactStore {
  override def name: String = "posix"

  private def schemaSidecar(root: String): java.io.File =
    new java.io.File(root.stripSuffix("/") + ".schema.json")

  private def kindSidecar(root: String): java.io.File =
    new java.io.File(root.stripSuffix("/") + ".artifact.json")

  private def tombstonesDir(root: String): String =
    root.stripSuffix("/") + ".tombstones"

  /** Unique temp + `ATOMIC_MOVE`: a concurrent reader of the sidecar
    * never sees a torn write.
    */
  private def atomicWrite(dst: java.io.File, content: String): Unit = {
    val tmp = java.nio.file.Paths
      .get(dst.getPath + "." + java.util.UUID.randomUUID() + ".tmp")
    java.nio.file.Files.writeString(tmp, content)
    java.nio.file.Files.move(tmp, dst.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private[graft] def writeSchemaSidecar(root: String,
                                        schema: StructType): Unit =
    atomicWrite(schemaSidecar(root), schema.json)

  private def writeKindSidecar(root: String, kind: String): Unit =
    atomicWrite(kindSidecar(root),
      s"""{"kind":"$kind","store":"$name"}""")

  override def exists(root: String): Boolean =
    // _SUCCESS, not bare directory existence: Spark writes the marker on
    // every committed write (overwrite AND append), so its absence means
    // a crashed/partial build — which callers must treat as absent
    new java.io.File(root, "_SUCCESS").exists()

  override def kindOf(root: String): Option[String] = {
    val f = kindSidecar(root)
    if (!f.exists()) None
    else {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(f.toPath))
      Option(m.get("kind")).map(_.asText())
    }
  }

  override def maintenanceLocked[T](root: String)(f: => T): T =
    Artifacts.maintenanceLocked(root)(f)

  private def tombstoneFiles(root: String): Seq[String] =
    Option(new java.io.File(tombstonesDir(root)).listFiles()).toSeq.flatten
      .filter(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.getPath)

  override def snapshot(spark: SparkSession,
                        root: String): ArtifactSnapshot = {
    val sc = schemaSidecar(root)
    val schema =
      if (sc.exists())
        Some(DataType.fromJson(
          java.nio.file.Files.readString(sc.toPath)).asInstanceOf[StructType])
      else None
    ArtifactSnapshot(Seq(root), schema, tombstoneFiles(root))
  }

  override def readLocked[T](spark: SparkSession, root: String)
                            (f: ArtifactSnapshot => T): T =
    Artifacts.readLocked(spark, root)(f(snapshot(spark, root)))

  override def buildOnce(spark: SparkSession, root: String, kind: String)
                        (write: String => Unit): Unit =
    maintenanceLocked(root) {
      // OS-level build lock: two driver JVMs racing the FIRST build of
      // the same content-tagged path serialize at the OS — the loser
      // re-checks _SUCCESS inside the lock and reads what the winner
      // built, instead of interleaving overwrites of a shared artifact
      Artifacts.withProcessLock(root.stripSuffix("/") + ".build.lock") {
        val fresh = !new java.io.File(root, "_SUCCESS").exists()
        if (fresh) write(root)
        // schema sidecar from build time: every later maintenance/serve
        // read can pass the schema explicitly, so a store a delete/fold
        // later EMPTIES still plans. A FRESH build rewrites it
        // unconditionally — a rebuild at the same path with a different
        // schema must not serve through a stale sidecar
        if (fresh || !schemaSidecar(root).exists())
          writeSchemaSidecar(root, spark.read.parquet(root).schema)
        if (fresh || !kindSidecar(root).exists())
          writeKindSidecar(root, kind)
      }
    }

  override def append(spark: SparkSession, root: String, kind: String)
                     (write: String => Unit): Unit =
    // maintenance lock: an append racing a compaction's staging read
    // would land its file in the OLD directory — renamed aside and
    // deleted with it when the compaction promotes
    maintenanceLocked(root) {
      write(root)
      // the append changed the store's FILE SET without a swap: stamp
      // the generation (and refresh this JVM's caches) so locked readers
      // in OTHER processes invalidate their cached pre-append listing
      Artifacts.stampGeneration(spark, root)
      if (!schemaSidecar(root).exists())
        writeSchemaSidecar(root, spark.read.parquet(root).schema)
      if (!kindSidecar(root).exists()) writeKindSidecar(root, kind)
    }

  override def replace(spark: SparkSession, root: String,
                       foldCaptured: Boolean)
                      (write: (ArtifactSnapshot, String) => StructType): Unit = {
    // captured INSIDE the write callback — i.e. under the .swap.lock —
    // so a racing maintenance op in another JVM cannot have folded-and-
    // deleted files this one already listed
    var captured: ArtifactSnapshot = null
    var schema: StructType = null
    Artifacts.writeThenSwapThen(spark, root) { tmp =>
      captured = snapshot(spark, root)
      schema = write(captured, tmp)
    } {
      // clear exactly the captured sidecar files INSIDE the exclusive
      // read-gate window: a locked reader sees tombstones+old store or
      // no-tombstones+folded store, never a plan over deleted sidecar
      // files; a batch appended mid-fold has a different filename and
      // survives to the next fold
      if (foldCaptured)
        captured.tombstonePaths.foreach(p => new java.io.File(p).delete())
      writeSchemaSidecar(root, schema) // serve survives a full fold
    }
  }

  override def tombstoneAppend(spark: SparkSession, root: String)
                              (check: ArtifactSnapshot => Unit)
                              (write: String => Unit): Unit = {
    // check + append under the store's read lock: a concurrent fold's
    // file clearing runs inside the exclusive gate window, so the
    // pending count here can never read files mid-delete. Lock order:
    // rw read lock → read gate → tombstones lock (innermost; nothing
    // else acquires it, so no cycle is possible). The exclusive
    // tombstones lock serializes the check+append pair across
    // tombstoners — without it, N concurrent tombstoners all read
    // pending < cap and all append, overshooting by N batches.
    Artifacts.readLocked(spark, root) {
      Artifacts.withProcessLock(
          root.stripSuffix("/") + ".tombstones.lock") {
        check(snapshot(spark, root))
        write(tombstonesDir(root))
      }
    }
    org.apache.spark.sql.graft.FileListingCache.invalidateAll(spark)
  }
}

/** The object-store protocol: immutable generation/segment directories
  * published through a versioned manifest log, maintenance exclusion
  * through a lease — every primitive is a single-object conditional PUT
  * (PUT-if-absent), which S3 (`If-None-Match`), GCS
  * (`ifGenerationMatch=0`) and HDFS (create-no-overwrite) all provide.
  * Locally the conditional PUT is emulated by ATOMIC hard-link creation
  * (`Files.createLink` fails with `FileAlreadyExists` when the target
  * exists, and links the FULL content in one atomic step — a plain
  * CREATE_NEW write would expose partially-written manifests to readers).
  *
  * Layout under the store root:
  * {{{
  *   <root>/_manifest/v00000001.json ...   immutable manifest versions
  *   <root>/_manifest/lease                maintenance lease (when held)
  *   <root>/gen-<uuid>/                    full-generation data dirs
  *   <root>/seg-<uuid>/                    ingest-append segment dirs
  *   <root>/ts-<uuid>/                     tombstone segment dirs
  * }}}
  *
  * The CURRENT manifest is the highest version in `_manifest/` (the
  * public Delta-log pattern: readers list ONE small directory of tiny
  * immutable files — never a mutable data directory, whose listing is
  * the operation object stores make slow and eventually consistent).
  * Every data path a reader ever scans is immutable once published, so
  * no listing-cache invalidation protocol exists at all — the POSIX
  * impl's `.generation` stamps and read gates have no manifest
  * counterpart because the problem they solve (in-place mutation) is
  * designed out.
  *
  * Crash safety: a writer that dies after staging but before its
  * conditional PUT leaves an unreferenced directory (garbage, collected
  * by the next replace's GC) and NO visible state change. A replace's GC
  * keeps everything referenced by the current AND immediately-previous
  * manifests — one full maintenance generation of grace for in-flight
  * readers, the same contract snapshot table formats ship with (pin a
  * snapshot explicitly if a read can span two maintenance cycles).
  *
  * Lease caveat (documented, inherent to leases): expiry
  * (`spark.graft.artifact.leaseMs`, default 600000) must exceed the
  * longest maintenance body, or a stalled holder can be stolen from; a
  * production deployment renews the lease from a heartbeat. Probes and
  * tombstoning never take it.
  */
object ManifestArtifactStore extends ArtifactStore {
  override def name: String = "manifest"

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  final case class Manifest(version: Long, kind: String,
                            schemaJson: Option[String],
                            segments: Seq[String], tombstones: Seq[String])

  private def manifestDir(root: String): java.nio.file.Path =
    java.nio.file.Paths.get(root, "_manifest")

  def isManifestStore(root: String): Boolean =
    java.nio.file.Files.isDirectory(manifestDir(root))

  private def versionFile(root: String, v: Long): java.nio.file.Path =
    manifestDir(root).resolve(f"v$v%08d.json")

  /** Numeric version of a manifest log file name; None for non-version
    * files (the lease, tmp staging). `\d{8,}`, parsed NUMERICALLY — the
    * zero-padded name widens to 9+ digits past version 10⁸ (a
    * high-rate-tombstone store reaches that), where NAME ordering would
    * pick the wrong maximum and a fixed-width match would wedge the CAS
    * loop against an unmatchable existing version.
    */
  private def versionOf(name: String): Option[Long] =
    if (name.matches("v\\d{8,}\\.json"))
      Some(name.stripPrefix("v").stripSuffix(".json").toLong)
    else None

  private def render(m: Manifest): String = {
    val json = JObject(
      "version" -> JInt(m.version), "kind" -> JString(m.kind),
      "schema" -> m.schemaJson.map(JString(_)).getOrElse(JNothing),
      "segments" -> JArray(m.segments.map(JString(_)).toList),
      "tombstones" -> JArray(m.tombstones.map(JString(_)).toList))
    JsonMethods.compact(JsonMethods.render(json))
  }

  private def parse(s: String): Manifest = {
    val j = JsonMethods.parse(s)
    def strs(field: String): Seq[String] = j \ field match {
      case JArray(xs) => xs.collect { case JString(x) => x }
      case _          => Nil
    }
    Manifest(
      (j \ "version").asInstanceOf[JInt].num.toLong,
      j \ "kind" match { case JString(k) => k; case _ => "" },
      j \ "schema" match { case JString(s) => Some(s); case _ => None },
      strs("segments"), strs("tombstones"))
  }

  /** Highest committed manifest, by listing the manifest log (small,
    * immutable files, pruned to the last [[KeepManifests]] on every
    * publish — the one listing the protocol performs stays O(16)).
    */
  private def current(root: String): Option[Manifest] = {
    val d = manifestDir(root)
    if (!java.nio.file.Files.isDirectory(d)) return None
    val vs = Option(d.toFile.listFiles()).toSeq.flatten
      .flatMap(f => versionOf(f.getName).map(_ -> f))
    if (vs.isEmpty) None
    else {
      val top = vs.maxBy(_._1)._2
      Some(parse(java.nio.file.Files.readString(top.toPath)))
    }
  }

  /** Manifest log versions retained after a publish. The top 2 carry the
    * GC reference grace; the rest are audit tail. Bounding the log is
    * what keeps every snapshot resolution's listing O(16) tiny files
    * regardless of publish count (a high-rate tombstone store publishes
    * per batch).
    */
  private val KeepManifests = 16

  private def pruneManifestLog(root: String): Unit = {
    val d = manifestDir(root)
    val vs = Option(d.toFile.listFiles()).toSeq.flatten
      .flatMap(f => versionOf(f.getName).map(_ -> f)).sortBy(_._1)
    vs.dropRight(KeepManifests).foreach { case (_, f) => f.delete() }
  }

  /** Conditional PUT of manifest version `m.version`: true iff this
    * writer committed it. Local emulation: write the full content to a
    * temp file, then ATOMICALLY claim the version name with a hard link
    * (fails when the version exists — the CAS; readers can never observe
    * partial content because the link carries the whole file).
    */
  private def publish(root: String, m: Manifest): Boolean = {
    val d = manifestDir(root)
    java.nio.file.Files.createDirectories(d)
    val tmp = d.resolve(s"tmp-${java.util.UUID.randomUUID()}.json")
    java.nio.file.Files.writeString(tmp, render(m))
    try {
      java.nio.file.Files.createLink(versionFile(root, m.version), tmp)
      pruneManifestLog(root)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  private def snapshotOf(root: String, m: Manifest): ArtifactSnapshot =
    ArtifactSnapshot(
      m.segments.map(s => new java.io.File(root, s).getPath),
      m.schemaJson.map(DataType.fromJson(_).asInstanceOf[StructType]),
      m.tombstones.map(t => new java.io.File(root, t).getPath))

  override def exists(root: String): Boolean = current(root).nonEmpty

  override def kindOf(root: String): Option[String] =
    current(root).map(_.kind).filter(_.nonEmpty)

  // ---- maintenance lease -------------------------------------------------

  /** Same-JVM re-entrancy + queueing for the lease (mirrors
    * [[Artifacts.withProcessLock]]'s ProcLock): the OS-visible lease is
    * per-process; threads of one JVM queue here.
    */
  private final class LeaseState {
    var holder: Thread = null
    var depth = 0
    var id: String = null
  }
  private val leases =
    new java.util.concurrent.ConcurrentHashMap[String, LeaseState]()

  private def leaseFile(root: String): java.nio.file.Path =
    manifestDir(root).resolve("lease")

  private def leaseMs: Long =
    try org.apache.spark.sql.SparkSession.active.conf
      .get("spark.graft.artifact.leaseMs", "600000").toLong
    catch { case _: Exception => 600000L }

  /** Claim the lease by conditional PUT; steal only a demonstrably
    * expired one, by CONDITIONAL DELETE — delete-if-content-unchanged.
    * An unconditional delete would let a slow stealer delete another
    * stealer's freshly re-claimed lease (both observed the old one
    * expired; one re-claims; the other's late delete kills the valid
    * claim — two concurrent maintenance bodies, the exact lost-batch
    * class the lease exists to prevent, r17 review). S3/GCS provide the
    * conditional delete natively (`If-Match` / `ifGenerationMatch`); the
    * local emulation serializes the compare+delete pair under a flock
    * sibling — emulation machinery like [[publish]]'s hard link, not
    * part of the protocol.
    */
  private def acquireLease(root: String): String = {
    val lf = leaseFile(root)
    java.nio.file.Files.createDirectories(lf.getParent)
    val mine = java.util.UUID.randomUUID().toString
    while (true) {
      val content = s"$mine ${System.currentTimeMillis() + leaseMs}"
      val tmp = lf.getParent.resolve(s"lease-tmp-$mine")
      java.nio.file.Files.writeString(tmp, content)
      val won =
        try { java.nio.file.Files.createLink(lf, tmp); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
        finally java.nio.file.Files.deleteIfExists(tmp)
      if (won) return mine
      val observed =
        try Some(java.nio.file.Files.readString(lf))
        catch { case _: java.io.IOException => None } // vanished: retry
      val expired = observed.exists { c =>
        val parts = c.split(" ")
        parts.length == 2 && System.currentTimeMillis() > parts(1).toLong
      }
      if (expired) conditionalDeleteLease(lf, observed.get)
      else Thread.sleep(25)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Local emulation of DELETE-if-content-matches on the lease object. */
  private def conditionalDeleteLease(lf: java.nio.file.Path,
                                     observed: String): Unit =
    Artifacts.withProcessLock(lf.toString + ".steal.lock") {
      val still =
        try java.nio.file.Files.readString(lf) == observed
        catch { case _: java.io.IOException => false } // already gone
      if (still) { java.nio.file.Files.deleteIfExists(lf); () }
    }

  private def releaseLease(root: String, id: String): Unit = {
    val lf = leaseFile(root)
    // release only OUR lease, conditionally like the steal: an expired
    // holder's late release must not delete a stealer's fresh claim
    Artifacts.withProcessLock(lf.toString + ".steal.lock") {
      val mine =
        try java.nio.file.Files.readString(lf).startsWith(id + " ")
        catch { case _: java.io.IOException => false }
      if (mine) { java.nio.file.Files.deleteIfExists(lf); () }
    }
  }

  override def maintenanceLocked[T](root: String)(f: => T): T = {
    val key = java.nio.file.Paths.get(root).toAbsolutePath.normalize().toString
    val st = leases.computeIfAbsent(key, _ => new LeaseState)
    val me = Thread.currentThread()
    val firstEntry = st.synchronized {
      while (st.holder != null && st.holder != me) st.wait()
      if (st.holder == me) { st.depth += 1; false }
      else { st.holder = me; st.depth = 1; true }
    }
    if (firstEntry) {
      try { val id = acquireLease(root); st.synchronized { st.id = id } }
      catch { case t: Throwable =>
        st.synchronized { st.holder = null; st.depth = 0; st.notifyAll() }
        throw t
      }
    }
    try f finally st.synchronized {
      st.depth -= 1
      if (st.depth == 0) {
        try releaseLease(root, st.id)
        finally { st.holder = null; st.id = null; st.notifyAll() }
      }
    }
  }

  // ---- snapshot / read ---------------------------------------------------

  override def snapshot(spark: SparkSession,
                        root: String): ArtifactSnapshot =
    snapshotOf(root, requireStore(root))

  override def readLocked[T](spark: SparkSession, root: String)
                            (f: ArtifactSnapshot => T): T =
    f(snapshot(spark, root)) // immutable generations: resolution IS the lock

  // ---- mutations ----------------------------------------------------------

  private def newDir(root: String, prefix: String): java.io.File = {
    val d = new java.io.File(root,
      s"$prefix-${java.util.UUID.randomUUID()}")
    java.nio.file.Files.createDirectories(d.toPath.getParent)
    d
  }

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
  }

  /** CAS-loop a manifest transition: `next(cur)` builds the successor
    * (None aborts). Retries when another writer commits first — under
    * the lease only TOMBSTONE publications can interleave with a
    * maintenance op's publish, so `next` must tolerate exactly that.
    */
  private def commit(root: String)
                    (next: Option[Manifest] => Option[Manifest]): Unit = {
    while (true) {
      val cur = current(root)
      next(cur) match {
        case None => return
        case Some(m) => if (publish(root, m)) return
      }
    }
  }

  override def buildOnce(spark: SparkSession, root: String, kind: String)
                        (write: String => Unit): Unit = {
    if (exists(root)) return
    maintenanceLocked(root) {
      if (!exists(root)) {
        val gen = newDir(root, "gen")
        write(gen.getPath)
        val schema = spark.read.parquet(gen.getPath).schema
        val won = publish(root, Manifest(1, kind, Some(schema.json),
          Seq(gen.getName), Nil))
        // under the lease v1 cannot be contended; belt-and-braces: a
        // lost race means another build won — drop our staging
        if (!won) rmTree(gen)
      }
    }
  }

  override def append(spark: SparkSession, root: String, kind: String)
                     (write: String => Unit): Unit =
    maintenanceLocked(root) {
      val seg = newDir(root, "seg")
      write(seg.getPath)
      commit(root) {
        case Some(cur) =>
          val schema = cur.schemaJson.orElse(
            Some(spark.read.parquet(seg.getPath).schema.json))
          Some(Manifest(cur.version + 1, cur.kind,
            schema, cur.segments :+ seg.getName, cur.tombstones))
        case None => // ingest-created store (the span-count pattern)
          Some(Manifest(1, kind,
            Some(spark.read.parquet(seg.getPath).schema.json),
            Seq(seg.getName), Nil))
      }
    }

  override def replace(spark: SparkSession, root: String,
                       foldCaptured: Boolean)
                      (write: (ArtifactSnapshot, String) => StructType): Unit =
    maintenanceLocked(root) {
      val captured = requireStore(root)
      val gen = newDir(root, "gen")
      val schema = write(snapshotOf(root, captured), gen.getPath)
      commit(root) { curOpt =>
        val cur = curOpt.get // a manifest can never disappear
        // under the lease, only tombstone publications can have
        // interleaved: segments are OURS to replace; pending tombstones
        // added AFTER the capture survive to the next fold
        Some(Manifest(cur.version + 1, cur.kind, Some(schema.json),
          Seq(gen.getName),
          if (foldCaptured) cur.tombstones.diff(captured.tombstones)
          else cur.tombstones))
      }
      gc(spark, root)
    }

  /** Delete data/tombstone dirs referenced by NEITHER the current nor the
    * immediately-previous manifest — the one-generation grace window for
    * in-flight readers — AND older than `spark.graft.artifact.gcGraceMs`
    * (default 600000). The age grace is load-bearing for tombstoners:
    * [[tombstoneAppend]] stages its segment WITHOUT the lease (it must
    * not park behind a long rewrite) and only then publishes, so a
    * replace's GC racing that window would otherwise collect a staged
    * segment the tombstoner is about to commit. Age-based orphan
    * collection is the standard object-store answer (a crashed writer's
    * staging is indistinguishable from an in-flight one until it ages
    * out). Writer-side listing of the root is fine — only READERS must
    * avoid listing mutable directories on an object store.
    */
  private def gc(spark: SparkSession, root: String): Unit = {
    // conf from the CALLER's session, not SparkSession.active — the
    // active session is thread-dependent and a conf-isolated child
    // session's setting must govern its own maintenance ops
    val grace = spark.conf.get("spark.graft.artifact.gcGraceMs", "600000")
      .toLong
    val d = manifestDir(root)
    val vs = Option(d.toFile.listFiles()).toSeq.flatten
      .flatMap(f => versionOf(f.getName).map(_ -> f)).sortBy(_._1)
    val keepManifests = vs.takeRight(2).map(_._2)
    val referenced = keepManifests.flatMap { f =>
      val m = parse(java.nio.file.Files.readString(f.toPath))
      m.segments ++ m.tombstones
    }.toSet
    val cutoff = System.currentTimeMillis() - grace
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName != "_manifest" &&
        !referenced.contains(f.getName) && f.lastModified() < cutoff)
      .foreach(rmTree)
  }

  /** Fail a mutation of a store that was never built — WITHOUT creating
    * anything at the path first: a failed call that left an empty root
    * directory would flip [[ArtifactStore.forPath]]'s layout sniff to
    * POSIX for every later op on that path.
    */
  private def requireStore(root: String): Manifest =
    current(root).getOrElse(throw new IllegalStateException(
      s"no manifest store at $root — build it first"))

  override def tombstoneAppend(spark: SparkSession, root: String)
                              (check: ArtifactSnapshot => Unit)
                              (write: String => Unit): Unit = {
    // existence is vetted BEFORE any directory is created: a failed
    // tombstone of a never-built store must not leave an empty root that
    // flips forPath's layout sniff to POSIX (r17 review). The batch is
    // then written ONCE (CAS retries must not re-evaluate a possibly
    // nondeterministic frame); admission re-checks against the committed
    // manifest on every attempt, so racing tombstoners admit exactly to
    // the cap
    requireStore(root)
    val ts = newDir(root, "ts")
    var written = false
    try commit(root) {
      case None => throw new IllegalStateException(
        s"no manifest store at $root — build it first") // raced a wipe
      case Some(cur) =>
        check(snapshotOf(root, cur)) // throws to refuse
        if (!written) { write(ts.getPath); written = true }
        Some(Manifest(cur.version + 1, cur.kind, cur.schemaJson,
          cur.segments, cur.tombstones :+ ts.getName))
    } catch { case t: Throwable => rmTree(ts); throw t }
  }
}
