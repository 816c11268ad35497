package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{Bpe, Corpus, Dedup, Quality, Sampling}

/** Null / empty / whitespace text must degrade gracefully, never throw:
  * the driver testdata carries no NULLs, but a 100 TB corpus always does,
  * and an operator that NPEs on one malformed row kills the whole stage.
  * Locks each text operator's behavior on a tiny corpus of pathological
  * rows plus one healthy row.
  */
class NullRobustnessSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    Seq((1L, null: String), (2L, ""), (3L, "   \t  "),
      (4L, "a healthy document with several distinct words"))
      .toDF("doc_id", "text")
  }

  test("scalar text functions return null/neutral on null text, never throw") {
    val r = docs.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("tc"),
      TextFunctions.langId(col("text")).as("lang"),
      TextFunctions.distinctTokenRatio(col("text")).as("dtr"),
      Quality.meanWordLength(col("text")).as("mwl"),
      Quality.linearScore(col("text")).as("score"),
      TextFunctions.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // whitespace-only and empty behave as zero-token docs
    assert(r(2L).getInt(1) == 0 && r(3L).getInt(1) == 0)
    assert(r(4L).getInt(1) == 7)
    // null text propagates null (or a neutral value), and no row is lost
    assert(r.size == 4)
  }

  test("corpus operators drop or pass through degenerate rows, never throw") {
    // tf-idf: only the healthy doc contributes terms
    val tfidf = Corpus.tfIdf(docs, "doc_id", "text")
    assert(tfidf.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      == Set(4L))
    // chunking emits nothing (or an empty chunk) for token-less docs
    val chunks = Corpus.chunk(docs, "doc_id", "text", chunkTokens = 4)
    assert(chunks.filter(col("doc_id") === 4L).count() >= 1)
    // vocabulary sees only real tokens
    val vocab = Corpus.vocabulary(docs, "doc_id", "text")
    assert(vocab.filter(col("term") === "").count() == 0)
    assert(vocab.count() == 7)
  }

  test("dedup family tolerates null and token-less documents") {
    assert(Dedup.ngramJaccardDupPairs(docs, "doc_id", "text", 0.5).count() == 0)
    assert(Dedup.ngramContainmentPairs(docs, "doc_id", "text", 0.5).count() == 0)
    val span = Dedup.spanDedup(docs, "doc_id", "text", k = 4)
    assert(span.count() == 4) // every doc survives, text possibly unchanged
    val decon = Dedup.decontaminate(docs, "doc_id", "text",
      docs.filter(col("doc_id") === 4L), "text")
    assert(decon.count() == 1) // only the healthy doc can hit the benchmark
  }

  test("bpe and sampling are null-safe") {
    val enc = Bpe.encode(col("text"), Seq(("a", "b")))
    val rows = docs.select(col("doc_id"), enc.as("sym"),
        Bpe.bpeTokenCount(enc).as("n"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(2L).getString(1) == "" && rows(2L).getLong(2) == 0L)
    assert(rows(4L).getLong(2) > 0L)
    // null text -> null symstring, not an exception
    assert(rows(1L).isNullAt(1))
    // importance sampling with a null weight keeps nothing for that row
    val kept = Sampling.importanceSample(docs, col("doc_id"),
      TextFunctions.distinctTokenRatio(col("text")))
    assert(kept.count() <= 4)
  }
}
