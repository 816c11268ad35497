package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ListenerBusUtil
import org.scalatest.funsuite.AnyFunSuite

/** Measured proof of the cube layout's at-scale IO claims, on data with
  * MANY parquet row groups per file (testdata and locally-built cube
  * buckets are single-row-group, where statistics skipping is invisible).
  *
  * Two claims under test (SCALE.md "clustered lattice leaves"; the
  * reference's raw-grain index behavior,
  * `docs/benchmark/BenchMarkDetails.org:146-160`):
  *  - clusterDims: rows sorted by a dimension inside each bucket turn a
  *    residual dim predicate into row-group min/max skips, vs reading
  *    every group on the same data unsorted;
  *  - a time-sorted node column (okey node's o_orderdate) turns a range
  *    predicate into a prefix read.
  *
  * `recordsRead` is the observable: the vectorized reader only materializes
  * rows of row groups that survive footer statistics filtering, so
  * (clustered recordsRead) / (unclustered recordsRead) IS the skip ratio.
  */
class RowGroupSkipSpec extends AnyFunSuite {
  import TestSpark._

  private val sf001 = "/root/testdata/sf0.01"
  private val dir = "target/cubes/rowgroup_spec"

  // ~60k flat rows at sf0.01 with an 80 KiB block size yield 25+ row
  // groups per file — enough groups that a 1/5th-selective dim slice can
  // show an order-of-magnitude skip.
  private lazy val fixture: Unit = {
    val flat = Tables.flat(spark, sf001)
      .select("l_shipdate", "o_orderdate", "c_mktsegment", "s_nation",
        "l_quantity", "l_extendedprice")
    def write(df: DataFrame, path: String): Unit =
      df.write.mode("overwrite")
        .option("parquet.block.size", 80 * 1024)
        .option("parquet.page.size", 8 * 1024)
        .parquet(path)
    // single partition + sortWithinPartitions = exactly the cube build's
    // per-bucket layout (TpchCube.ensure / CubeRefresh), one file
    val one = flat.repartition(1)
    write(one.sortWithinPartitions("c_mktsegment", "s_nation"), s"$dir/clustered")
    // same rows, same block size, insertion order (interleaved segments)
    write(one, s"$dir/unclustered")
    write(one.sortWithinPartitions("o_orderdate"), s"$dir/time_sorted")
  }

  private def rowGroups(path: String): Int = {
    val f = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.getAbsolutePath),
      spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getBlocks.size() finally r.close()
  }

  private val read = new AtomicLong
  private val listener = new SparkListener {
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      if (te.taskMetrics != null)
        read.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
  }

  /** recordsRead for a full evaluation of `df`. */
  private def recordsRead(df: DataFrame): Long = {
    spark.sparkContext.addSparkListener(listener)
    try {
      ListenerBusUtil.waitUntilEmpty(spark)
      read.set(0L)
      df.write.mode("overwrite").format("noop").save()
      ListenerBusUtil.waitUntilEmpty(spark)
      read.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("clusterDims sort turns a dim residual predicate into row-group skips") {
    fixture
    val groups = rowGroups(s"$dir/clustered")
    assert(groups >= 8, s"fixture must be multi-row-group, got $groups")
    val pred = "c_mktsegment = 'BUILDING' AND s_nation = 'NATION_3'"
    val clustered = recordsRead(
      spark.read.parquet(s"$dir/clustered").where(pred))
    val unclustered = recordsRead(
      spark.read.parquet(s"$dir/unclustered").where(pred))
    val total = spark.read.parquet(s"$dir/unclustered").count()
    info(f"dim slice: clustered reads $clustered%,d of $total%,d rows " +
      f"(${100.0 * clustered / total}%.1f%%), unclustered reads " +
      f"$unclustered%,d (${100.0 * unclustered / total}%.1f%%), " +
      f"skip ratio ${unclustered.toDouble / clustered}%.1fx")
    // unsorted layout: every row group contains every segment -> no skips
    assert(unclustered == total,
      "unclustered scan should read every row group")
    // clustered layout: 1/(5 segments x 25 nations) selectivity must skip
    // the vast majority of groups (boundary groups straddle two values)
    assert(clustered * 10 <= unclustered,
      s"expected >=10x row-group skip, got $unclustered/$clustered")
    // and results are identical either way
    assert(spark.read.parquet(s"$dir/clustered").where(pred).count() ==
      spark.read.parquet(s"$dir/unclustered").where(pred).count())
  }

  test("time-sorted node column turns a range predicate into a prefix read") {
    fixture
    // literal cast to the column's OWN type — a mistyped literal would
    // insert a cast on the column and silently disable footer-statistics
    // pushdown. Cutoff ~10% into this testdata's o_orderdate range
    // (1995-01 .. 2001-08).
    def pred(df: DataFrame) =
      df.where(col("o_orderdate") <
        lit("1995-09-01").cast(df.schema("o_orderdate").dataType))
    val sorted = recordsRead(pred(spark.read.parquet(s"$dir/time_sorted")))
    val unsorted = recordsRead(pred(spark.read.parquet(s"$dir/unclustered")))
    val total = spark.read.parquet(s"$dir/unclustered").count()
    info(f"time range: sorted reads $sorted%,d of $total%,d rows " +
      f"(${100.0 * sorted / total}%.1f%%), unsorted reads $unsorted%,d, " +
      f"skip ratio ${unsorted.toDouble / sorted}%.1fx")
    assert(unsorted == total, "unsorted scan should read every row group")
    assert(sorted * 4 <= unsorted,
      s"expected >=4x skip on the date prefix, got $unsorted/$sorted")
    assert(pred(spark.read.parquet(s"$dir/time_sorted")).count() ==
      pred(spark.read.parquet(s"$dir/unclustered")).count())
  }
}
