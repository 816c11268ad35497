package org.apache.spark.sql.graft

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{classic, DataFrame}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Column-pruning-aware scan-byte accounting for benchmark reporting.
  *
  * Local-FS `bytesRead` task metrics are blind to what the vectorized
  * parquet reader actually fetches, so "bytes scanned" is computed from
  * the plan instead: for every parquet `FileSourceScanExec`, list the
  * partition-pruned files and sum the compressed on-disk size of exactly
  * the column chunks the scan's `requiredSchema` selects. This is the
  * scale-invariant IO measure behind the reference's byte-ratio argument
  * (index column storage vs raw extract): it reflects both partition
  * pruning and column pruning, independent of OS page cache effects.
  * Row-group statistics skipping is NOT modeled here — it is measured
  * separately (SCALE.md) — so the figure is an upper bound on bytes a
  * cold scan must read.
  */
object ScanBytes {

  /** Actual parquet footer opens performed by this JVM (cache misses
    * only) — the observable cost of every measurement path here, so specs
    * can assert plan-time bounds (footer opens ≤ cap) instead of trusting
    * the cap by inspection.
    */
  val footerReads = new java.util.concurrent.atomic.AtomicLong(0)

  /** Scan bytes of eagerly-checkpointed SUBTREES (r20 verdict item 3):
    * an operator that `localCheckpoint`s its input mid-construction (the
    * pack family) leaves a final plan with NO file scan, so [[of]] reads 0
    * and the committed detail loses its plan-drift adjudication signal for
    * those queries. Such operators report the pre-checkpoint frame's scan
    * bytes here; the bench enables collection around its (untimed) IO
    * measurement pass and adds the figure to [[of]]'s. Disabled by default
    * so the timed path never pays the extra plan derivation.
    */
  @volatile var auxEnabled: Boolean = false
  val auxBytes = new java.util.concurrent.atomic.AtomicLong(0)

  /** Record a checkpointed subtree's scan bytes (no-op unless enabled). */
  def recordAux(df: DataFrame): Unit =
    if (auxEnabled)
      try auxBytes.addAndGet(of(df))
      catch { case scala.util.control.NonFatal(_) => () }

  /** (file path, mtime) -> per-top-level-column compressed bytes. */
  private val footerCache =
    TrieMap.empty[(String, Long), Map[String, Long]]

  private def columnBytes(conf: org.apache.hadoop.conf.Configuration,
                          path: Path, mtime: Long): Map[String, Long] =
    footerCache.getOrElseUpdate((path.toString, mtime), {
      footerReads.incrementAndGet()
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
      try {
        reader.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .groupMapReduce(_.getPath.iterator().next().toLowerCase)(
            _.getTotalSize)(_ + _)
      } finally reader.close()
    })

  private def scansOf(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collectWithSubqueries {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: QueryStageExec        => scansOf(q.plan)
      case f: FileSourceScanExec    => Seq(f)
    }.flatten

  /** All parquet scans of an executed frame, descending through AQE
    * stages and subqueries (a bare `executedPlan.collect` sees none of
    * them once AQE wraps the plan).
    */
  def scans(df: DataFrame): Seq[FileSourceScanExec] =
    scansOf(df.asInstanceOf[classic.Dataset[_]].queryExecution.executedPlan)
      .distinct

  /** (file path, mtime) -> footer row count. */
  private val rowCache = TrieMap.empty[(String, Long), Long]

  /** Rows of a file set under a footer-open budget: exact sum when the
    * set fits `cap`, else a rows-per-byte ratio sampled over `cap`
    * evenly-spaced files and extrapolated over the exact byte total.
    * Files are (path, mtime, len); `bytes` is the full set's length sum.
    */
  private def cappedRows(conf: org.apache.hadoop.conf.Configuration,
                         files: IndexedSeq[(Path, Long, Long)],
                         bytes: Long, cap: Int): Long =
    if (files.length <= cap)
      files.map(f => fileRows(conf, f._1, f._2)).sum
    else {
      val step = files.length.toDouble / cap
      val sample = (0 until cap).map(i => files((i * step).toInt))
      val sRows = sample.map(f => fileRows(conf, f._1, f._2)).sum
      val sBytes = sample.map(_._3).sum
      if (sBytes <= 0L) 0L
      else math.round(bytes.toDouble * sRows / sBytes)
    }

  private def fileRows(conf: org.apache.hadoop.conf.Configuration,
                       path: Path, mtime: Long): Long =
    rowCache.getOrElseUpdate((path.toString, mtime), {
      footerReads.incrementAndGet()
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
      try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
      finally reader.close()
    })

  /** One parquet scan's planned IO: root paths, selected file count, and
    * footer-measured rows/bytes after static partition pruning + column
    * pruning. Usable BEFORE execution (the initial AQE plan already
    * carries the scans); runtime/dynamic pruning is not reflected, so the
    * figures are the upper bound a cost gate should price.
    */
  final case class ScanCost(rootPaths: Seq[String], files: Long,
                            rows: Long, bytes: Long)

  /** Planned IO of every parquet scan of a (not necessarily executed)
    * frame — the measured half of `EXPLAIN GRAFT COST`.
    */
  def costs(df: DataFrame): Seq[ScanCost] = {
    val classicDs = df.asInstanceOf[classic.Dataset[_]]
    costsOf(classicDs.sparkSession, classicDs.queryExecution.executedPlan)
  }

  /** [[costs]] from a physical plan directly — the form the query-history
    * listener uses (it has a `QueryExecution`, not a frame).
    *
    * `footerCap` bounds the per-call footer reads: measuring rows/bytes
    * opens each selected file's footer once (cached thereafter), which is
    * the right price for a bench/EXPLAIN but not for a passive listener on
    * a 100k-file production scan — past the cap a scan reports its file
    * count with rows/bytes = -1 (unmeasured), keeping the listener
    * O(cached listing).
    */
  def costsOf(spark: org.apache.spark.sql.SparkSession,
              plan: SparkPlan,
              footerCap: Int = Int.MaxValue): Seq[ScanCost] = {
    val conf = spark.asInstanceOf[classic.SparkSession]
      .sessionState.newHadoopConf()
    scansOf(plan).distinct.map { scan =>
      val cols = scan.requiredSchema.fieldNames.map(_.toLowerCase).toSet
      val files = scan.relation.location
        .listFiles(scan.partitionFilters, scan.dataFilters)
        .flatMap(_.files)
      val (rows, bytes) =
        if (files.length > footerCap) (-1L, -1L)
        else files.foldLeft((0L, 0L)) { case ((r, b), f) =>
          try {
            val cb = columnBytes(conf, f.getPath, f.getModificationTime)
              .filter { case (c, _) => cols.contains(c) }.values.sum
            (r + fileRows(conf, f.getPath, f.getModificationTime), b + cb)
          } catch { case _: Throwable => (r, b) }
        }
      ScanCost(scan.relation.location.rootPaths.map(_.toString),
        files.length.toLong, rows, bytes)
    }
  }

  /** Footer-measured totals of a whole parquet artifact directory:
    * (files, rows, bytes) over every parquet file under `path`,
    * recursively — the per-NODE stored size the rollup router prices
    * competing lattice nodes with (the reference's cost model prices
    * routes from segment index stats the same way;
    * `DruidQueryCostModel.scala:345-414`). `bytes` is on-disk file length
    * (whole artifact, not per-column — node choice happens before column
    * pruning is known). Returns (0, 0, 0) for a missing/empty path —
    * callers treat that as "unmeasured", not "free". Memoized per path:
    * artifact paths are content-keyed ([[graft.Tables.contentTag]]), and
    * in-place refreshes invalidate via [[invalidateDirCosts]]. At cluster
    * scale the one recursive listing per artifact is the same cost the
    * file index already pays; a manifest would replace it on an object
    * store.
    */
  private val dirCache = TrieMap.empty[String, (Long, Long, Long)]

  /** `footerCap` bounds the footer opens exactly as in [[prunedCost]]:
    * past the cap, bytes stay exact (listing lengths) and rows are a
    * rows-per-byte ratio sampled over `footerCap` evenly-spaced files —
    * a 100k-file artifact must never cost 100k driver footer reads just
    * to show up in a metadata view. Non-positive caps floor to 1.
    */
  def dirCost(spark: org.apache.spark.sql.SparkSession,
              path: String,
              footerCap: Int = Int.MaxValue): (Long, Long, Long) =
    dirCache.get(path).getOrElse {
      // only SUCCESSFUL observations are memoized (including a genuinely
      // missing/empty dir — refresh invalidates those): a transient
      // listing/footer exception returns unmeasured for THIS call only,
      // so one hiccup cannot pin the session to unmeasured prices
      try {
        val conf = spark.asInstanceOf[classic.SparkSession]
          .sessionState.newHadoopConf()
        val p = new Path(path)
        val fs = p.getFileSystem(conf)
        val v =
          if (!fs.exists(p)) (0L, 0L, 0L)
          else {
            val files = scala.collection.mutable.ArrayBuffer
              .empty[(Path, Long, Long)] // (path, mtime, len)
            val it = fs.listFiles(p, true)
            while (it.hasNext) {
              val st = it.next()
              if (st.isFile && st.getPath.getName.endsWith(".parquet"))
                files += ((st.getPath, st.getModificationTime, st.getLen))
            }
            val bytes = files.map(_._3).sum
            val rows = cappedRows(conf, files.toIndexedSeq, bytes,
              math.max(1, footerCap))
            (files.length.toLong, rows, bytes)
          }
        dirCache.putIfAbsent(path, v)
        v
      } catch { case scala.util.control.NonFatal(_) => (0L, 0L, 0L) }
    }

  def invalidateDirCosts(): Unit = { dirCache.clear(); prunedCache.clear() }

  /** (root paths, name-normalized partition predicates) -> pruned cost. */
  private val prunedCache = TrieMap.empty[(String, String), (Long, Long, Long)]

  /** Post-pruning footer cost of a planned scan over `relation`: the
    * query's partition-column predicates applied to the relation's file
    * listing (the same pruning `FileSourceStrategy` performs), then
    * footer-measured rows and on-disk bytes of exactly the surviving
    * files. This is the query's actual slice of the artifact — the
    * reference prices competing routes on it (interval ratio × index
    * stats, `DruidQueryCostModel.scala:660-689` `estimateInput`), not on
    * whole-datasource size, and so does the lattice router here.
    *
    * `filters` may be any conjunct set: predicates that are
    * nondeterministic, carry a subquery, or reference a non-partition
    * column are dropped (pruning with a subset of the predicates is
    * always an over-approximation, never wrong) — EXCEPT a foldable
    * always-false/null conjunct (e.g. the `Literal(false)` a non-midnight
    * time-equality translation emits), which proves the scan empty and
    * short-circuits to (0, 0, 0) before any IO. Returns None when the
    * listing or footer reads fail — "unmeasured", which callers must
    * treat as neither free nor infinite. Successful prices are memoized
    * per (root path, name-keyed predicate set) — the listing itself is
    * the relation's in-memory file index, so a miss costs footer reads of
    * the surviving files only (each cached per file thereafter);
    * [[invalidateDirCosts]] clears this cache too.
    *
    * `footerCap` bounds the plan-time footer opens per call — the same
    * discipline [[costsOf]] applies at the listener. When the pruned
    * listing exceeds the cap, bytes stay EXACT (the listing's `getLen`
    * sum is free) and rows are estimated from a rows-per-byte ratio
    * sampled over `footerCap` evenly-spaced surviving files. The
    * reference prices routes from segment stats without ever opening
    * segments (`DruidQueryCostModel.scala:660-689`); past the cap this
    * does the moral equivalent, keeping first-contact pricing O(cap) on
    * the driver at 100k-file artifact sizes. The memo key ignores the
    * cap — the first observation per (path, predicate set) wins, exact
    * or sampled; both are valid prices of the same slice and routing
    * only compares them ordinally. A non-positive `footerCap` is floored
    * to 1 — a cap of zero would make every multi-file node price rows=0
    * (an empty sample), i.e. look FREE to the router, and memoize that.
    */
  def prunedCost(spark: org.apache.spark.sql.SparkSession,
                 relation: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
                 filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                 footerCap: Int = Int.MaxValue)
      : Option[(Long, Long, Long)] = {
    val cap = math.max(1, footerCap)
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, PlanExpression}
    // a provably-empty scan is free regardless of partition columns:
    // WHERE false (and WHERE null) select no rows
    val provablyEmpty = filters.exists { c =>
      c.deterministic && c.foldable &&
        (try { val v = c.eval(null); v == null || v == false }
         catch { case scala.util.control.NonFatal(_) => false })
    }
    if (provablyEmpty) return Some((0L, 0L, 0L))
    val partCols = relation.partitionSchema.fieldNames.map(_.toLowerCase).toSet
    val partPreds = filters.filter { c =>
      c.deterministic &&
        c.find(_.isInstanceOf[PlanExpression[_]]).isEmpty &&
        c.references.nonEmpty &&
        c.references.forall(a => partCols.contains(a.name.toLowerCase))
    }
    // cache key by column NAME, not exprId — the same predicate arrives
    // with fresh ids on every query instance
    def keyOf(e: Expression): String =
      e.transform { case a: Attribute => UnresolvedAttribute(Seq(a.name)) }.toString
    val key = (relation.location.rootPaths.map(_.toString).sorted.mkString(","),
      partPreds.map(keyOf).sorted.mkString(" & "))
    prunedCache.get(key).map(Some(_)).getOrElse {
      try {
        val conf = spark.asInstanceOf[classic.SparkSession]
          .sessionState.newHadoopConf()
        val files = relation.location.listFiles(partPreds, Nil).flatMap(_.files)
          .map(f => (f.getPath, f.getModificationTime, f.getLen)).toIndexedSeq
        val bytes = files.map(_._3).sum
        val rows = cappedRows(conf, files, bytes, cap)
        val v = (files.length.toLong, rows, bytes)
        prunedCache.putIfAbsent(key, v)
        Some(v)
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Bytes the frame's parquet scans must read, post partition- and
    * column-pruning. Call AFTER executing the frame so AQE's final plan
    * (with reused/materialized stages) is in place.
    */
  def of(df: DataFrame): Long = {
    val classicDs = df.asInstanceOf[classic.Dataset[_]]
    val conf = classicDs.sparkSession.sessionState.newHadoopConf()
    scans(df).map { scan =>
      val cols = scan.requiredSchema.fieldNames.map(_.toLowerCase).toSet
      val files = scan.relation.location
        .listFiles(scan.partitionFilters, scan.dataFilters)
        .flatMap(_.files)
      files.map { f =>
        try columnBytes(conf, f.getPath, f.getModificationTime)
          .filter { case (c, _) => cols.contains(c) }.values.sum
        catch { case _: Throwable => 0L } // non-parquet or unreadable file
      }.sum
    }.sum
  }
}
