package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.KmvSketch
import org.scalatest.funsuite.AnyFunSuite

/** KMV (theta-style) distinct sketch: exactness below k, bounded error
  * beyond k, union-merge semantics, and the partial/final split across
  * partitions (the property that makes it a valid rollup metric).
  */
class KmvSketchSpec extends AnyFunSuite {
  import TestSpark._

  test("exact below k, including duplicates and nulls") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    val df = ((1 to 500).map(i => Some(i % 100)) :+ None).toDF("x")
      .repartition(7)
    val n = df.agg(KmvSketch.kmvDistinct(col("x"), 256)).head().getLong(0)
    assert(n == 100L)
  }

  test("estimate within 5% beyond k") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    val df = (1 to 100000).toDF("x").repartition(16)
    val n = df.agg(KmvSketch.kmvDistinct(col("x"), 1024)).head().getLong(0)
    assert(math.abs(n - 100000L) < 5000L, s"estimate $n too far from 100000")
  }

  test("sketch union == sketch of union (mergeability)") {
    val a = new KmvSketch.Buffer(64)
    val b = new KmvSketch.Buffer(64)
    val whole = new KmvSketch.Buffer(64)
    val rnd = new scala.util.Random(7)
    val hs = Seq.fill(5000)(rnd.nextLong())
    hs.take(2500).foreach(a.add)
    hs.drop(2500).foreach(b.add)
    hs.foreach(whole.add)
    val merged = KmvSketch.deserialize(a.serialize).merge(KmvSketch.deserialize(b.serialize))
    assert(merged.set == whole.set)
    assert(merged.estimate == whole.estimate)
  }

  test("SQL functions registered; sketch column round-trips via merge") {
    Graft.install(spark)
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    (1 to 3000).map(i => (i % 3, i % 601)).toDF("g", "x")
      .createOrReplaceTempView("kmv_t")
    // direct
    val direct = spark.sql(
      "SELECT g, kmv_distinct(x) AS nd FROM kmv_t GROUP BY g ORDER BY g")
      .collect().map(_.getLong(1))
    assert(direct.forall(_ == 601L))
    // two-level: per-group sketches, then merged across groups
    val merged = spark.sql(
      """SELECT kmv_merge_estimate(sk) AS nd FROM
        |  (SELECT g, kmv_sketch(x) AS sk FROM kmv_t GROUP BY g) t""".stripMargin)
      .head().getLong(0)
    assert(merged == 601L)
    // small-k estimation path through SQL
    val est = spark.sql("SELECT kmv_distinct(x, 64) AS nd FROM kmv_t")
      .head().getLong(0)
    assert(math.abs(est - 601L) < 90L, s"kmv_distinct(64) estimate $est")
  }

  test("set-op estimates are exact below k (intersection / difference)") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    // A = {0..599}, B = {400..999}: |A ∩ B| = 200, |A \ B| = 400, |B \ A| = 400
    val a = (0 until 600).toDF("x").repartition(5)
      .agg(KmvSketch.kmvSketch(col("x"), 2048).as("sk"))
    val b = (400 until 1000).toDF("x").repartition(3)
      .agg(KmvSketch.kmvSketch(col("x"), 2048).as("sk"))
    val r = a.crossJoin(b.withColumnRenamed("sk", "skB"))
      .select(
        KmvSketch.kmvIntersectEstimate(col("sk"), col("skB")).as("inter"),
        KmvSketch.kmvDifferenceEstimate(col("sk"), col("skB")).as("aNotB"),
        KmvSketch.kmvDifferenceEstimate(col("skB"), col("sk")).as("bNotA"))
      .head()
    assert(r.getLong(0) == 200L && r.getLong(1) == 400L && r.getLong(2) == 400L)
  }

  test("set-op estimates stay within 10% when a side saturates") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    // |A| = 50k, |B| = 40k, overlap 20k; k = 1024 saturates both
    val a = (0 until 50000).toDF("x")
      .agg(KmvSketch.kmvSketch(col("x"), 1024).as("sk"))
    val b = (30000 until 70000).toDF("x")
      .agg(KmvSketch.kmvSketch(col("x"), 1024).as("sk"))
    val r = a.crossJoin(b.withColumnRenamed("sk", "skB"))
      .select(
        KmvSketch.kmvIntersectEstimate(col("sk"), col("skB")).as("inter"),
        KmvSketch.kmvDifferenceEstimate(col("sk"), col("skB")).as("aNotB"))
      .head()
    assert(math.abs(r.getLong(0) - 20000L) < 2000L, s"inter ${r.getLong(0)}")
    assert(math.abs(r.getLong(1) - 30000L) < 3000L, s"aNotB ${r.getLong(1)}")
  }

  test("SQL set-op functions registered") {
    val got = spark.sql(
      """SELECT kmv_intersect_estimate(a.sk, b.sk) AS i,
        |       kmv_difference_estimate(a.sk, b.sk) AS d
        |FROM (SELECT kmv_sketch(id) AS sk FROM range(0, 300)) a
        |CROSS JOIN (SELECT kmv_sketch(id) AS sk FROM range(200, 500)) b""".stripMargin)
      .head()
    assert(got.getLong(0) == 100L && got.getLong(1) == 200L)
  }
}
