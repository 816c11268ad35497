package graft

import org.apache.spark.sql.graft.ScanBytes
import org.scalatest.funsuite.AnyFunSuite

/** Locks the bench's scan-byte accounting: footer-measured column bytes
  * must reflect column pruning and partition/file pruning, and be
  * consistent with the file's physical size.
  */
class ScanBytesSpec extends AnyFunSuite {
  import TestSpark._

  test("column pruning shrinks measured scan bytes") {
    val li = Tables.t(spark, sf, "lineitem")
    val narrow = li.select("l_orderkey", "l_quantity")
    val wide = li
    narrow.write.mode("overwrite").format("noop").save()
    wide.write.mode("overwrite").format("noop").save()
    val nb = ScanBytes.of(narrow)
    val wb = ScanBytes.of(wide)
    assert(nb > 0, "narrow scan must report bytes")
    assert(nb < wb / 2,
      s"2 of 16 columns should cost well under half the full scan ($nb vs $wb)")
    val onDisk = new java.io.File(Tables.path(sf, "lineitem")).length()
    assert(wb <= onDisk, "column chunks cannot exceed the physical file")
    assert(wb > onDisk / 2, "full-width scan should cover most of the file")
  }

  test("an empty-interval plan reports zero bytes") {
    val li = Tables.t(spark, sf, "lineitem")
    val none = li.filter("l_shipdate < timestamp'1900-01-01'")
    none.write.mode("overwrite").format("noop").save()
    // data filters don't prune files on an unpartitioned single file, so
    // this only locks that the call is safe and bounded by the full width
    assert(ScanBytes.of(none) <= new java.io.File(Tables.path(sf, "lineitem")).length())
  }

  test("dirCost past the footerCap: bytes exact, rows sampled, opens bounded") {
    val dir = s"/root/repo/target/cubes/test_dircost_${new java.io.File(sf).getName}_${Tables.contentTag(sf)}"
    if (!new java.io.File(dir, "_SUCCESS").exists())
      Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
        .repartition(10).write.mode("overwrite").parquet(dir)
    ScanBytes.invalidateDirCosts()
    TestSpark.quiesceFooterReads()
    val before = ScanBytes.footerReads.get()
    val (files, rows, bytes) = ScanBytes.dirCost(spark, dir, footerCap = 3)
    val opens = ScanBytes.footerReads.get() - before
    assert(files == 10, s"expected 10 files, got $files")
    assert(opens <= 3, s"footer opens must be <= cap, got $opens")
    val exactBytes = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    assert(bytes == exactBytes)
    val trueRows = Tables.t(spark, sf, "lineitem").count()
    assert(math.abs(rows - trueRows) <= math.max(1L, trueRows / 5),
      s"sampled $rows vs true $trueRows")
    // a pathological non-positive cap still measures (floored to 1),
    // never reports a multi-file dir as free
    ScanBytes.invalidateDirCosts()
    val (_, rows0, _) = ScanBytes.dirCost(spark, dir, footerCap = 0)
    assert(rows0 > 0, s"cap=0 must floor to 1, not price rows=0 (got $rows0)")
  }
}
