package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, Profile, Sampling}

/** Specs for the deterministic-sampling, corpus-statistics, and column-
  * profiling operators.
  */
class SamplingCorpusProfileSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = Tables.t(spark, sf, "documents").cache()

  test("bucket is deterministic, in range, and salt-independent across salts") {
    val b1 = docs.select(Sampling.bucket(col("doc_id"), 1).as("b")).collect().map(_.getLong(0))
    val b1again = docs.select(Sampling.bucket(col("doc_id"), 1).as("b")).collect().map(_.getLong(0))
    val b2 = docs.select(Sampling.bucket(col("doc_id"), 2).as("b")).collect().map(_.getLong(0))
    assert(b1.sameElements(b1again))
    assert(!b1.sameElements(b2))
    assert(b1.forall(b => b >= 0 && b < Sampling.Modulus))
  }

  test("importanceSample: weight 1 keeps all, 0 keeps none, rate tracks weight") {
    val n = docs.count()
    assert(Sampling.importanceSample(docs, col("doc_id"), lit(1.0)).count() == n)
    assert(Sampling.importanceSample(docs, col("doc_id"), lit(0.0)).count() == 0)
    // out-of-range weights clamp instead of exploding
    assert(Sampling.importanceSample(docs, col("doc_id"), lit(7.5)).count() == n)
    assert(Sampling.importanceSample(docs, col("doc_id"), lit(-3.0)).count() == 0)
    val kept = Sampling.importanceSample(docs, col("doc_id"), lit(0.3), salt = 5)
      .count().toDouble
    assert(math.abs(kept / n - 0.3) < 0.1, s"kept ${kept / n} for weight 0.3")
    // deterministic: the same call yields the same membership
    val a = Sampling.importanceSample(docs, col("doc_id"), lit(0.3), salt = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.importanceSample(docs, col("doc_id"), lit(0.3), salt = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("sample keeps roughly the requested fraction and is stable") {
    val n = docs.count().toDouble
    val s1 = Sampling.sample(docs, col("doc_id"), 0.3, salt = 5)
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.sample(docs, col("doc_id"), 0.3, salt = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    assert(math.abs(ids1.size / n - 0.3) < 0.1)
    // a smaller fraction with the same salt is a subset (threshold monotone)
    val smaller = Sampling.sample(docs, col("doc_id"), 0.1, salt = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(smaller.subsetOf(ids1))
  }

  test("leakageSafeSplit keeps near-dup cluster members in one split") {
    val df = spark.createDataFrame(
      (1L to 8L).map(i => (i, s"doc $i"))).toDF("doc_id", "text")
    // two clusters: {1,2} rep 1, {5,6} rep 5 (connectedComponents shape)
    val clusters = spark.createDataFrame(Seq(
      (1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))).toDF("node", "component")
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.leakageSafeSplit(df, "doc_id", clusters, w, salt = 11)
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 8)
    assert(got(1L) == got(2L) && got(5L) == got(6L))
    // clustered docs take the REP's hash; unclustered take their own
    val ofKey = df.select(col("doc_id"),
        Sampling.assignSplit(col("doc_id"), w, salt = 11).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(2L) == ofKey(1L) && got(6L) == ofKey(5L))
    assert(Seq(3L, 4L, 7L, 8L).forall(i => got(i) == ofKey(i)))
  }

  test("stratifiedSample applies per-stratum rates") {
    val out = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("zh" -> 1.0, "en" -> 0.0), defaultFraction = 0.5, salt = 1)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("zh") == totals("zh"))
    assert(!byLang.contains("en"))
    for (l <- Seq("de", "es", "fr"))
      assert(byLang(l) > 0 && byLang(l) < totals(l))
  }

  test("assignSplit covers every row exactly once with stable assignment") {
    val split = Sampling.assignSplit(col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = 3)
    val out = docs.withColumn("split", split)
    assert(out.count() == docs.count())
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > counts("val"))
    // appending rows never moves existing rows between splits
    val sub = docs.filter(col("doc_id") < 100).withColumn("split", split)
    val full = out.filter(col("doc_id") < 100)
    assert(sub.select("doc_id", "split").collect().toSet ==
      full.select("doc_id", "split").collect().toSet)
  }

  test("weightedMix samples each source at its own rate and tags rows") {
    val en = docs.filter(col("lang") === "en")
    val zh = docs.filter(col("lang") === "zh")
    val mix = Sampling.weightedMix(
      Seq(("web", en, 0.5), ("books", zh, 1.0)), "doc_id", Seq("doc_id"))
    val bySrc = mix.groupBy("mix_source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("books") == zh.count())
    assert(bySrc("web") > 0 && bySrc("web") < en.count())
  }

  test("vocabulary counts tf and df correctly on a known corpus") {
    val tiny = spark.createDataFrame(Seq(
      (1L, "a b a"), (2L, "a c"), (3L, "C c"))).toDF("id", "text")
    val v = Corpus.vocabulary(tiny, "id", "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(v("a") == ((3L, 2L)))
    assert(v("b") == ((1L, 1L)))
    assert(v("c") == ((3L, 2L))) // case-folded: "C c" is two c's in one doc
  }

  test("tfIdf scores rare terms above common ones within a document") {
    val tiny = spark.createDataFrame(Seq(
      (1L, "common rare"), (2L, "common x"), (3L, "common y"))).toDF("id", "text")
    val rows = Corpus.tfIdf(tiny, "id", "text")
      .filter(col("id") === 1L).collect()
      .map(r => r.getString(r.fieldIndex("term")) ->
        r.getDouble(r.fieldIndex("score"))).toMap
    assert(rows("rare") == 1.0 * 3.0 / 1.0)
    assert(rows("common") == 1.0 * 3.0 / 3.0)
    assert(rows("rare") > rows("common"))
  }

  test("chunk windows cover every token; boundaries and short docs behave") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val tiny = spark.createDataFrame(Seq(
      (1L, words(3)),   // shorter than a chunk: one chunk, whole text
      (2L, words(8)),   // exactly chunkTokens: one chunk
      (3L, words(9)),   // one past: second chunk must add w9
      (4L, words(20)))) // several strides
      .toDF("id", "text")
    val out = Corpus.chunk(tiny, "id", "text", chunkTokens = 8, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getLong(3)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).map(_._3).toSeq == Seq(words(3)))
    assert(byDoc(2L).map(_._3).toSeq == Seq(words(8)))
    // stride 6: doc 3 chunks start at tokens 1 and 7
    assert(byDoc(3L).sortBy(_._2).map(_._3).toSeq ==
      Seq(words(8), "w7 w8 w9"))
    // every token of doc 4 appears in some chunk; consecutive chunks
    // overlap by exactly 2 tokens
    val c4 = byDoc(4L).sortBy(_._2).map(_._3.split(" ").toSeq)
    assert(c4.flatten.toSet == (1 to 20).map(i => s"w$i").toSet)
    for (w <- c4.sliding(2) if w.length == 2)
      assert(w(0).takeRight(2) == w(1).take(2))
    // n_tokens column matches the actual chunk sizes
    assert(out.forall { case (_, _, text, n) => text.split(" ").length == n })
  }

  test("dedupLines drops corpus-frequent lines, keeps order, retains empty docs") {
    val tiny = spark.createDataFrame(Seq(
      (1L, "keep one\nBOILER\nkeep two"),
      (2L, "BOILER\nunique line"),
      (3L, "BOILER\nBOILER"),       // scrubbed to empty, must still appear
      (4L, "solo document line")))
      .toDF("id", "text")
    val out = Corpus.dedupLines(tiny, "id", "text", minDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("keep one\nkeep two", 2L, 1L)))
    assert(out(2L) == (("unique line", 1L, 1L)))
    assert(out(3L) == (("", 0L, 2L)))   // all lines boilerplate
    assert(out(4L) == (("solo document line", 1L, 0L)))
    assert(out.size == 4)
  }

  test("packSequences is partitioning-independent and fills bins to capacity") {
    val docs = Tables.t(spark, sf, "documents")
    def pack(df: org.apache.spark.sql.DataFrame) =
      Corpus.packSequences(df, "doc_id", "text", capacity = 1000)
        .select("doc_id", "n_tokens", "bin_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val a = pack(docs)
    val b = pack(docs.repartition(7))
    assert(a.sameElements(b), "bin assignment must not depend on layout")
    // exclusive-prefix striping with every doc shorter than the capacity:
    // bin ids are contiguous and every non-final bin holds at least
    // capacity - (max doc length) tokens (the previous bin's straddler
    // can eat at most maxDoc-1 tokens of this bin's range)
    val maxDoc = a.map(_._2).max
    assert(maxDoc < 1000, "test assumes docs shorter than the capacity")
    val bins = a.groupBy(_._3).toSeq.sortBy(_._1)
    assert(bins.map(_._1) == (0L until bins.size.toLong).toSeq)
    for ((bin, rows) <- bins.dropRight(1))
      assert(rows.map(_._2).sum >= 1000 - maxDoc, s"bin $bin under-filled")
  }

  test("packByCount under spark.graft.pack.checkpoint=reliable matches local") {
    val docs = Tables.t(spark, sf, "documents")
    def pack() =
      Corpus.packSequences(docs, "doc_id", "text", capacity = 1000)
        .select("doc_id", "n_tokens", "bin_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val local = pack()
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft-pack-reliable").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    spark.conf.set("spark.graft.pack.checkpoint", "reliable")
    try {
      val reliable = pack()
      assert(local.sameElements(reliable),
        "reliable-checkpoint packing must bin identically")
    } finally {
      spark.conf.unset("spark.graft.pack.checkpoint")
    }
  }

  test("profile reports exact per-column stats in one pass") {
    val tiny = spark.createDataFrame(Seq(
      (1, Some(2.0)), (2, None), (3, Some(4.5)), (3, Some(4.5))))
      .toDF("k", "v")
    val p = Profile.profile(tiny, Seq("k", "v"), exact = true).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = p("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 4 && k.getLong(3) == 3)
    assert(k.getDouble(4) == 1.0 && k.getDouble(5) == 3.0)
    val v = p("v")
    assert(v.getLong(1) == 4 && v.getLong(2) == 3 && v.getLong(3) == 2)
    assert(v.getDouble(4) == 2.0 && v.getDouble(5) == 4.5)
  }

  test("profile plans without Expand; exact adds per-column distinct passes") {
    val plan = Profile.profile(docs, Seq("doc_id", "lang"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Expand"))
    // exact distincts are separate pre-aggregated scans crossjoined onto
    // the stats row — NOT the Expand rewrite that pushes |cols|+1 copies
    // of every row through the aggregation
    val exact = Profile.profile(docs, Seq("doc_id", "lang"), exact = true)
      .queryExecution.optimizedPlan
    assert(!exact.toString.contains("Expand"),
      "exact distinct counts must not Expand the scan")
    val joins = exact.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size == 2, "one scalar crossjoin per profiled column")
  }
}
