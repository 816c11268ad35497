package graft.plans

import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-query execution history — the reference records every Druid query
  * issued on behalf of a SQL statement and exposes it for introspection
  * (`metadata/DruidQueryHistory.scala`, thriftserver UI tab). The Spark
  * analog: a `QueryExecutionListener` classifies each completed action by
  * what SERVED it (a rollup node, the flat cube, or raw sources) and
  * appends to a bounded in-memory ring, queryable as the
  * `graft_query_history` view (`REGISTER GRAFT VIEWS`) or via
  * `SHOW GRAFT HISTORY`.
  *
  * The ring is driver-local metadata (like [[RewriteStats]]): a few hundred
  * small rows, no executor involvement — history introspection must never
  * cost a shuffle at any scale.
  */
object QueryHistory {

  final case class Entry(
      id: Long,
      atMs: Long,
      /** listener funcName — the action that triggered execution */
      action: String,
      /** `rollup:<cube>[<ordinal>]`, `cube:<name>`, or `raw` */
      served: String,
      durationMs: Long,
      /** head of the optimized plan, truncated — enough to recognize the
        * query without retaining whole plan trees
        */
      planHead: String,
      /** advisor classification, computed at record time (no SQL text or
        * plan tree survives into the ring): per registered cube, the
        * dimension + sketch columns a rollup would need to serve this
        * query. Empty when no cube can serve it.
        */
      needs: Seq[(String, Set[String], Set[String])] = Nil,
      /** planned parquet IO of the EXECUTED plan (post-AQE), measured from
        * footers after partition + column pruning
        * ([[org.apache.spark.sql.graft.ScanBytes]]) — the reference's
        * per-query execution-metrics surface
        * (`DruidQueryExecutionMetric.scala`, `DruidQueriesPage`) exposed
        * per history row instead of a UI tab. -1 = unmeasured (non-parquet
        * sources, or the footer read failed).
        */
      scanFiles: Long = -1L,
      scanRows: Long = -1L,
      scanBytes: Long = -1L)

  private val nextId = new AtomicLong(0L)
  private val maxEntries = 256
  private val ring = mutable.ArrayDeque.empty[Entry]

  def record(e: Entry): Unit = ring.synchronized {
    ring.append(e)
    if (ring.size > maxEntries) { ring.removeHead(); () }
  }

  /** Record a one-time BUILD cost (session warm-up, artifact
    * materialization, first-touch index training) as a first-class
    * history row — `served = "build:<what>"` — so a session's slow first
    * query is attributable in `graft_query_history` instead of reading as
    * an unexplained outlier. `detail` lands in the planHead column.
    */
  def recordBuild(what: String, durationMs: Long, detail: String): Unit =
    record(Entry(nextId.incrementAndGet(), System.currentTimeMillis(),
      "build", s"build:$what", durationMs, detail))

  def snapshot: Seq[Entry] = ring.synchronized(ring.toSeq)

  def clear(): Unit = ring.synchronized { ring.clear() }

  /** Materialized PIPELINE artifacts — IVF vector stores, n-gram pair
    * indexes, span-count stores — registered by their builders
    * (path -> kind), so history attributes scans of them instead of
    * classifying the pipeline half of the engine `raw`. Driver-local
    * metadata like the ring itself; registration is idempotent and
    * re-registering a rebuilt path just refreshes the kind.
    */
  private val artifacts =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def registerArtifact(kind: String, path: String): Unit = {
    artifacts.put(graft.cube.CubeCatalog.normalizePath(path), kind)
    ()
  }

  /** Drop every artifact registration — the fresh-session state. The
    * in-memory map is only the SESSION half of the registry; the durable
    * half is each store's own kind metadata (`.artifact.json` sidecar /
    * manifest `kind` field), re-attachable with
    * `REGISTER GRAFT ARTIFACT FROM '<path>'`.
    */
  private[graft] def clearArtifacts(): Unit = artifacts.clear()

  /** (kind, normalized path) of every registered artifact — the
    * `graft_artifacts` metadata view's source.
    */
  def artifactsSnapshot: Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    artifacts.asScala.toSeq.map { case (p, k) => (k, p) }.sortBy(identity)
  }

  /** What served this plan: the first scan that maps to a registered rollup
    * node, cube extract, or materialized pipeline artifact wins; anything
    * else is `raw`.
    */
  private[graft] def servedBy(qe: QueryExecution): String = {
    val paths = qe.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.map(p => graft.cube.CubeCatalog.normalizePath(p.toString))
        case _ => Nil
      }
    }.flatten
    val cubes = graft.cube.CubeCatalog.all
    val byRollup = paths.iterator.flatMap { p =>
      cubes.iterator.flatMap { c =>
        c.rollups.zipWithIndex.collectFirst {
          case (r, i) if graft.cube.CubeCatalog.normalizePath(r.path) == p =>
            s"rollup:${c.info.name}[$i]"
        }
      }
    }.toSeq.headOption
    def byCube = paths.iterator.flatMap { p =>
      cubes.iterator.collectFirst {
        case c if graft.cube.CubeCatalog.normalizePath(c.cubePath) == p =>
          s"cube:${c.info.name}"
      }
    }.toSeq.headOption
    def byArtifact = paths.iterator
      .flatMap(p => Option(artifacts.get(p)).map(k => s"artifact:$k"))
      .toSeq.headOption
    byRollup.orElse(byCube).orElse(byArtifact).getOrElse("raw")
  }

  private final class Listener extends QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = {
      val head = qe.optimizedPlan.toString.linesIterator.take(4)
        .mkString(" | ").take(300)
      // classify against every registered cube NOW — the static analysis is
      // a plan collect (no execution), and retaining the compact need
      // instead of the plan keeps the ring cheap while making the history
      // feed ADVISE GRAFT ROLLUP directly
      val needs = try {
        graft.cube.CubeCatalog.all.flatMap { c =>
          graft.cube.RollupAdvisor.analyzePlan(c, qe.analyzed, head)
            .map(n => (c.info.name, n.dims, n.sketchCols))
        }
      } catch { case _: Exception => Nil }
      // footer-measured planned IO of the final (post-AQE) physical plan:
      // listing + footer reads are metadata-cheap and cached per file, and
      // this is the one place the session can attribute scan rows/bytes to
      // an individual executed query
      val (sf, sr, sb) = try {
        // cap footer reads: a passive listener must stay O(cached listing)
        // even on a 100k-file scan — over the cap files are counted and
        // rows/bytes report unmeasured
        val cs = org.apache.spark.sql.graft.ScanBytes
          .costsOf(qe.sparkSession, qe.executedPlan, footerCap = 2048)
        if (cs.isEmpty) (-1L, -1L, -1L)
        else if (cs.exists(_.rows < 0))
          (cs.map(_.files).sum, -1L, -1L)
        else (cs.map(_.files).sum, cs.map(_.rows).sum, cs.map(_.bytes).sum)
      } catch { case _: Exception => (-1L, -1L, -1L) }
      record(Entry(nextId.incrementAndGet(), System.currentTimeMillis(),
        funcName, servedBy(qe), durationNs / 1000000L, head, needs,
        sf, sr, sb))
    }
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()
  }

  // one listener per session — install() is called per query entrypoint,
  // registration must stay idempotent
  private val installed =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def install(spark: SparkSession): Unit =
    if (installed.put(spark, java.lang.Boolean.TRUE) == null) {
      spark.listenerManager.register(new Listener)
    }
}
