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
