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

  /** (file path, mtime) -> per-top-level-column compressed bytes. */
  private val footerCache =
    TrieMap.empty[(String, Long), Map[String, Long]]

  private def columnBytes(conf: org.apache.hadoop.conf.Configuration,
                          path: Path, mtime: Long): Map[String, Long] =
    footerCache.getOrElseUpdate((path.toString, mtime), {
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

  private def fileRows(conf: org.apache.hadoop.conf.Configuration,
                       path: Path, mtime: Long): Long =
    rowCache.getOrElseUpdate((path.toString, mtime), {
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
    val conf = classicDs.sparkSession.sessionState.newHadoopConf()
    scans(df).map { scan =>
      val cols = scan.requiredSchema.fieldNames.map(_.toLowerCase).toSet
      val files = scan.relation.location
        .listFiles(scan.partitionFilters, scan.dataFilters)
        .flatMap(_.files)
      val (rows, bytes) = files.foldLeft((0L, 0L)) { case ((r, b), f) =>
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
