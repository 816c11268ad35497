package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FreqSketch
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Misra-Gries heavy-hitters sketch: exactness below k, the classic n/(k+1)
  * survival + error guarantees beyond k, union mergeability (the property
  * that makes it a valid rollup metric), and the SQL surface. Plus the
  * decontamination operator built on shared shingles.
  */
class FreqSketchSpec extends AnyFunSuite {
  import TestSpark._

  test("exact counts and err = 0 below k, across partitions") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    // 100 distinct values, value i%100 appears with skewed frequency
    val rows = (1 to 10000).map(i => (i * 2654435761L % 100).toString)
    val df = rows.toDF("x").repartition(13)
    val items = df.agg(FreqSketch.freqItems(col("x"), 256).as("fi"))
      .select(explode(col("fi")).as("e"))
      .select(col("e.item"), col("e.cnt"), col("e.err"))
      .collect()
    val expected = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(items.length == expected.size)
    assert(items.forall(_.getLong(2) == 0L), "unsaturated sketch must report err 0")
    items.foreach { r =>
      assert(r.getLong(1) == expected(r.getString(0)),
        s"count mismatch for ${r.getString(0)}")
    }
    // heaviest-first with deterministic tie-break
    val cnts = items.map(_.getLong(1)).toSeq
    assert(cnts == cnts.sorted.reverse)
  }

  test("beyond k: heavy item survives with count within err of truth") {
    val b = new FreqSketch.Buffer(8)
    val rnd = new scala.util.Random(11)
    // one heavy item (30% of stream) among 1000 distinct light ones
    var heavyTrue = 0L
    (1 to 20000).foreach { _ =>
      if (rnd.nextDouble() < 0.3) { b.add("HEAVY"); heavyTrue += 1 }
      else b.add("light-" + rnd.nextInt(1000))
    }
    val got = b.counts.get("HEAVY")
    assert(b.counts.containsKey("HEAVY"), "an item above n/(k+1) must survive")
    assert(got <= heavyTrue && got + b.err >= heavyTrue,
      s"stored $got + err ${b.err} must bracket true $heavyTrue")
  }

  test("merge of partial sketches == single-pass sketch when unsaturated") {
    val a = new FreqSketch.Buffer(512)
    val b = new FreqSketch.Buffer(512)
    val whole = new FreqSketch.Buffer(512)
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(20000)("v" + rnd.nextInt(300))
    xs.take(10000).foreach(x => a.add(x))
    xs.drop(10000).foreach(x => b.add(x))
    xs.foreach(x => whole.add(x))
    val merged = FreqSketch.deserialize(a.serialize)
      .merge(FreqSketch.deserialize(b.serialize))
    assert(merged.err == 0L)
    assert(merged.counts == whole.counts)
  }

  test("merged saturated sketches keep the additive error bound") {
    // two saturated sketches over disjoint key spaces: merge must re-bound
    // to k counters and account the cut in err
    val a = new FreqSketch.Buffer(16)
    val b = new FreqSketch.Buffer(16)
    (1 to 2000).foreach(i => a.add("a" + i % 40))
    (1 to 2000).foreach(i => b.add("b" + i % 40))
    val merged = FreqSketch.deserialize(a.serialize)
      .merge(FreqSketch.deserialize(b.serialize))
    assert(merged.counts.size <= 16)
    assert(merged.err >= a.err + b.err,
      "merge must carry both sides' error plus the re-bounding cut")
  }

  test("SQL surface: freq_items direct == freq_sketch + freq_merge_items") {
    Graft.install(spark)
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    (1 to 6000).map(i => (i % 3, "s" + i % 97)).toDF("g", "x")
      .createOrReplaceTempView("freq_t")
    val direct = spark.sql(
      "SELECT explode(freq_items(x, 128)) AS e FROM freq_t")
      .selectExpr("e.item", "e.cnt").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val twoLevel = spark.sql(
      """SELECT explode(freq_merge_items(sk)) AS e FROM
        |  (SELECT g, freq_sketch(x, 128) AS sk FROM freq_t GROUP BY g) t""".stripMargin)
      .selectExpr("e.item", "e.cnt").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(direct.nonEmpty && direct == twoLevel)
  }

  test("weighted sketch micros match the DECIMAL(28,6) sum convention") {
    Graft.install(spark)
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    val df = (1 to 5000).map(i => ("k" + i % 37, i * 0.07 + 0.001))
      .toDF("k", "w").repartition(9)
    df.createOrReplaceTempView("fw_t")
    val viaSketch = spark.sql(
      """SELECT e.item, e.cnt FROM (
        |  SELECT explode(freq_merge_items(sk)) AS e FROM (
        |    SELECT k AS g, freq_sketch_by(k, w, 256) AS sk FROM fw_t GROUP BY k) t)
        |""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.sql(
      "SELECT k, sum(CAST(w AS DECIMAL(28,6))) AS s FROM fw_t GROUP BY k")
      .collect().map { r =>
        r.getString(0) ->
          r.getDecimal(1).setScale(6).unscaledValue().longValueExact()
      }.toMap
    assert(viaSketch.nonEmpty && viaSketch == exact)
  }

  test("decontaminate flags exactly the documents sharing an n-gram") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated words only here today friend"),
      (3L, "we said the quick brown fox runs far away"),
      (4L, "short doc")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "benchmark asks about the quick brown fox indeed"),
      (101L, "short doc")).toDF("bid", "btext")
    val out = Dedup.decontaminate(corpus, "doc_id", "text", bench, "btext", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1 and 3 share "the quick brown fox"; doc 1 also shares
    // "quick brown fox jumps"? no — bench has "quick brown fox indeed".
    // doc 4 is shorter than n and matches bench doc 101 whole-text shingle.
    assert(out.keySet == Set(1L, 3L, 4L), s"got $out")
    assert(out(1L) == 1L && out(3L) == 1L && out(4L) == 1L)
  }
}
