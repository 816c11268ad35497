package graft.tools

import java.io.FileNotFoundException
import java.net.URI
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** An ADVERSARIAL in-process object store, registered as a Hadoop
  * `FileSystem` (`fs.<scheme>.impl = graft.tools.ObjectStoreFs`) and
  * backed by a local directory — the injectable fake the manifest
  * protocol's third binding is proven against (r18 verdict item 2).
  * It models the behaviors that make plain object stores UNSAFE for
  * rename-based coordination, faithfully enough that a protocol bug
  * corrupts data instead of throwing:
  *
  *   - `rename` is a NON-ATOMIC copy-then-delete that silently
  *     OVERWRITES an existing destination (plain S3 semantics) — an
  *     engine that wrongly ran the HDFS rename-CAS here would lose
  *     claims with no error anywhere;
  *   - objects are INVISIBLE until `close()` (writes buffer to a
  *     staging file; the PUT happens at close), read-after-write
  *     consistent by key (`getFileStatus`/`open` see a closed object
  *     immediately);
  *   - LISTINGS can be DELAYED (`fs.<scheme>.graft.fake.listDelayMs`):
  *     `listStatus` hides objects PUT within the window — the
  *     list-after-write lag of eventually-consistent stores;
  *   - `create(p, overwrite = false)` honesty is the MODE SWITCH
  *     (`fs.<scheme>.graft.fake.mode`): `conditional` models a store
  *     with conditional writes (S3 `If-None-Match`, GCS
  *     `ifGenerationMatch=0`) — the object lands ATOMICALLY with full
  *     content at close, or close throws `FileAlreadyExistsException`
  *     when the key exists (the lost claim); `plain` models a store
  *     WITHOUT them — overwrite=false is a LIE, the PUT replaces any
  *     existing object silently. The engine must refuse to run the
  *     manifest CAS on a `plain`-class scheme (no attested
  *     `fs.graft.cas.<scheme>` mechanism) rather than corrupt.
  *
  * Backing layout: `fs.<scheme>.graft.fake.root`/<authority>/<path>.
  * Test-only machinery — never a production binding.
  */
class ObjectStoreFs extends FileSystem {
  private var fsUri: URI = _
  private var rootDir: java.io.File = _
  private var mode: String = "plain"
  private var listDelayMs: Long = 0L
  private var workDir: Path = new Path("/")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    val scheme = name.getScheme
    fsUri = URI.create(
      scheme + "://" + Option(name.getAuthority).getOrElse(""))
    val root = conf.get(s"fs.$scheme.graft.fake.root")
    if (root == null)
      throw new java.io.IOException(
        s"ObjectStoreFs needs fs.$scheme.graft.fake.root (backing dir)")
    mode = conf.get(s"fs.$scheme.graft.fake.mode", "plain")
    listDelayMs = conf.getLong(s"fs.$scheme.graft.fake.listDelayMs", 0L)
    rootDir = new java.io.File(root,
      Option(name.getAuthority).getOrElse("bucket"))
    rootDir.mkdirs()
    ()
  }

  override def getUri: URI = fsUri

  private def dbg(msg: => String): Unit =
    if (getConf != null && getConf.getBoolean(
        s"fs.${fsUri.getScheme}.graft.fake.log", false))
      System.err.println(s"[fakefs] $msg")

  private def local(p: Path): java.nio.file.Path = {
    val rel = p.toUri.getPath.stripPrefix("/")
    if (rel.isEmpty) rootDir.toPath
    else new java.io.File(rootDir, rel).toPath
  }

  private def qualify(p: Path): Path = p.makeQualified(fsUri, workDir)

  private def statusOf(p: Path, lp: java.nio.file.Path): FileStatus = {
    val f = lp.toFile
    new FileStatus(if (f.isFile) f.length() else 0L, f.isDirectory, 1,
      4 * 1024 * 1024, f.lastModified(), qualify(p))
  }

  override def getFileStatus(p: Path): FileStatus = {
    val lp = local(p)
    if (!Files.exists(lp)) throw new FileNotFoundException(p.toString)
    statusOf(p, lp)
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    val lp = local(p)
    if (!Files.exists(lp)) throw new FileNotFoundException(p.toString)
    if (Files.isRegularFile(lp)) Array(statusOf(p, lp))
    else {
      val cutoff = System.currentTimeMillis() - listDelayMs
      // the committer's `_temporary` staging is exempt from the lag:
      // it is the WRITER's own private coordination state, which real
      // object-store deployments either keep off the store entirely
      // (direct-write committers) or run on a consistent layer — the
      // lag models the store's PUBLIC listing surface, where readers
      // and the manifest protocol live
      val exempt = p.toUri.getPath.contains("_temporary")
      val r = Option(lp.toFile.listFiles()).getOrElse(Array.empty)
        // the eventual-consistency lag: a just-PUT object is readable
        // by key but absent from listings for listDelayMs (directories
        // list immediately — stores emulate them from key prefixes)
        .filter(f => f.isDirectory || exempt || listDelayMs == 0L ||
          f.lastModified() < cutoff)
        .map(f => statusOf(new Path(p, f.getName), f.toPath))
      dbg(s"listStatus $p -> ${r.map(_.getPath.getName).mkString(",")}")
      r
    }
  }

  /** Whole-object read into memory (objects here are manifests and
    * test-scale parquet), wrapped seekable for the parquet reader.
    */
  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    val lp = local(p)
    if (!Files.isRegularFile(lp))
      throw new FileNotFoundException(p.toString)
    val bytes = Files.readAllBytes(lp)
    new FSDataInputStream(new SeekableBytes(bytes))
  }

  private final class SeekableBytes(bytes: Array[Byte])
      extends java.io.InputStream with Seekable with PositionedReadable {
    private var pos = 0L
    override def read(): Int =
      if (pos >= bytes.length) -1
      else { val b = bytes(pos.toInt) & 0xff; pos += 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (pos >= bytes.length) return -1
      val n = math.min(len, bytes.length - pos.toInt)
      System.arraycopy(bytes, pos.toInt, b, off, n)
      pos += n
      n
    }
    override def seek(newPos: Long): Unit = {
      if (newPos < 0 || newPos > bytes.length)
        throw new java.io.EOFException(s"seek $newPos of ${bytes.length}")
      pos = newPos
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, b: Array[Byte], off: Int,
                      len: Int): Int = {
      if (position >= bytes.length) return -1
      val n = math.min(len, bytes.length - position.toInt)
      System.arraycopy(bytes, position.toInt, b, off, n)
      n
    }
    override def readFully(position: Long, b: Array[Byte], off: Int,
                           len: Int): Unit = {
      if (read(position, b, off, len) < len)
        throw new java.io.EOFException(s"readFully past ${bytes.length}")
      ()
    }
    override def readFully(position: Long, b: Array[Byte]): Unit =
      readFully(position, b, 0, b.length)
  }

  /** Buffer to a staging sibling; the PUT happens at close. Conditional
    * mode + overwrite=false: atomic claim by hard link — exists means
    * `FileAlreadyExistsException` AT CLOSE, exactly where S3's
    * `If-None-Match` precondition fails. Plain mode ignores
    * overwrite=false entirely (the adversarial lie).
    */
  override def create(p: Path, permission: FsPermission,
                      overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val lp = local(p)
    dbg(s"create $p overwrite=$overwrite")
    Option(lp.getParent).foreach(d => Files.createDirectories(d))
    val tmp = lp.getParent.resolve(
      s".staging-${java.util.UUID.randomUUID()}")
    val raw = Files.newOutputStream(tmp)
    val conditional = mode == "conditional" && !overwrite
    val out = new java.io.FilterOutputStream(raw) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        raw.write(b, off, len) // FilterOutputStream's loop is O(n) calls
      override def close(): Unit = {
        raw.close()
        try {
          if (conditional) {
            try Files.createLink(lp, tmp)
            catch {
              case _: java.nio.file.FileAlreadyExistsException =>
                throw new FileAlreadyExistsException(
                  s"$p: conditional PUT precondition failed (If-None-Match)")
            }
            ()
          } else {
            // plain PUT: replaces whatever is there — even when the
            // caller asked overwrite=false and the store has no
            // conditional writes to honor it with
            Files.move(tmp, lp, StandardCopyOption.REPLACE_EXISTING,
              StandardCopyOption.ATOMIC_MOVE)
            ()
          }
        } finally { Files.deleteIfExists(tmp); () }
      }
    }
    new FSDataOutputStream(out, null)
  }

  override def append(p: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new java.io.IOException("object stores do not append")

  /** Plain-object-store rename: COPY every object under src to dst
    * (replacing silently), then delete src — non-atomic, overwriting,
    * and visibly two-phase to a concurrent reader.
    */
  override def rename(src: Path, dst: Path): Boolean = {
    dbg(s"rename $src -> $dst")
    val ls = local(src)
    val ld = local(dst)
    if (!Files.exists(ls)) return false
    def copy(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      if (Files.isDirectory(from)) {
        Files.createDirectories(to)
        Option(from.toFile.listFiles()).getOrElse(Array.empty).foreach(f =>
          copy(f.toPath, to.resolve(f.getName)))
      } else {
        Option(to.getParent).foreach(d => Files.createDirectories(d))
        Files.copy(from, to, StandardCopyOption.REPLACE_EXISTING)
        ()
      }
    }
    copy(ls, ld)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(ls.toFile)
    true
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    dbg(s"delete $p recursive=$recursive")
    val lp = local(p)
    if (!Files.exists(lp)) false
    else if (Files.isDirectory(lp) && !recursive &&
      Option(lp.toFile.listFiles()).exists(_.nonEmpty))
      throw new java.io.IOException(s"$p is a non-empty directory")
    else {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(lp.toFile)
      true
    }
  }

  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    Files.createDirectories(local(p)); true
  }

  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }
  override def getWorkingDirectory: Path = workDir
}
