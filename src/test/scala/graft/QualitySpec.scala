package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quality

/** Specs for the Gopher-style document quality rules: hand-computed values
  * on constructed documents (the gate query `q_text_gopher` additionally
  * cross-checks the whole family against DuckDB on the testdata corpus).
  */
class QualitySpec extends AnyFunSuite {
  import TestSpark._

  private def docsDF(rows: (Long, String)*) = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    rows.toDF("doc_id", "text")
  }

  test("scalar rules: mean word length, alpha ratio, symbol ratio") {
    val df = docsDF(1L -> "ab abc a", 2L -> "ab 12 c3", 3L -> "# hi ..... x …", 4L -> "   ")
    val got = df.select(col("doc_id"),
        Quality.meanWordLength(col("text")).as("mwl"),
        Quality.alphaWordRatio(col("text")).as("awr"),
        Quality.symbolWordRatio(col("text")).as("swr"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) == (((2.0 + 3.0 + 1.0) / 3.0, 1.0, 0.0)))
    assert(got(2L)._2 == 2.0 / 3.0)       // "12" has no letter
    // doc 3: 5 tokens; one '#', one dot-run (counts once), one unicode ellipsis
    assert(got(3L)._3 == 3.0 / 5.0)
    assert(got(4L) == ((0.0, 0.0, 0.0)))  // whitespace-only doc
  }

  test("line rules: duplicate-line chars and bullet/ellipsis lines") {
    val df = docsDF(
      1L -> "aa\nbb\naa",            // 'aa' duplicated: 4 of 6 chars
      2L -> "• x\nplain\nend...",    // bullet start + ellipsis end: 2 of 3
      3L -> "one\n\n  \ntwo")        // blank/whitespace lines dropped
    val got = df.select(col("doc_id"),
        Quality.duplicateLineCharFraction(col("text")).as("dl"),
        Quality.bulletOrEllipsisLineFraction(col("text")).as("be"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L)._1 == 4.0 / 6.0)
    assert(got(2L)._2 == 2.0 / 3.0)
    assert(got(3L) == ((0.0, 0.0)))
  }

  test("ngramRepetition: hand-checked bigram stats") {
    val df = docsDF(
      1L -> "aa bb aa bb aa",  // every bigram duplicated; top 'aa bb' ×2
      2L -> "x y z",           // no repeats
      3L -> "solo")            // shorter than n
    val got = Quality.ngramRepetition(df, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // doc 1: total token chars 10; 'aa bb' occurs 2× covering 2*4=8 chars
    assert(got(1L) == ((0.8, 1.0)))
    // doc 2: top bigram 'x y' ×1 → 2/3; nothing duplicated
    assert(got(2L) == ((2.0 / 3.0, 0.0)))
    assert(got(3L) == ((0.0, 0.0)))
  }

  test("ngramRepetition: tied counts keep the lexicographically smallest gram") {
    // 'z q' ×2 (4-1=3 covered chars each) vs 'aaa b' ×2 (5-1=4 each): tied
    // at count 2, the sorted-run fold must keep 'aaa b' (first in binary
    // order), so top = 2*4 / 12 — a strictly-greater update that kept the
    // LAST run would report 2*3/12 instead
    val df = docsDF(1L -> "z q z q aaa b aaa b")
    val Array(r) = Quality.ngramRepetition(df, "doc_id", "text", n = 2).collect()
    assert(r.getDouble(1) == 8.0 / 12.0)
  }

  test("ngramRepetition: overlap clamps top fraction at 1.0") {
    // 'a a a a': bigram 'a a' ×3, chars 3*2=6 > total 4 → clamp to 1.0;
    // dup coverage is every position → 1.0
    val df = docsDF(1L -> "a a a a")
    val Array(r) = Quality.ngramRepetition(df, "doc_id", "text", n = 2).collect()
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0)
  }

  test("ngramRepetition n=5 finds a repeated phrase") {
    val phrase = "the quick brown fox jumps"
    val df = docsDF(
      1L -> s"$phrase over the dog $phrase end",
      2L -> "all tokens here are totally distinct from one another")
    val got = Quality.ngramRepetition(df, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // doc 1: phrase tokens cover 2×21 chars of 55 total (dup coverage 42/55)
    assert(got(1L)._2 == 42.0 / 55.0)
    assert(got(1L)._1 == 42.0 / 55.0)
    assert(got(2L)._2 == 0.0)
  }

  test("subwordCount: boundary splits and long-run pieces, hand-computed") {
    // moved out of q_doc_fingerprint (lookaround regex has no RE2 oracle);
    // this unit lock carries its coverage instead
    val df = docsDF(
      1L -> "ab",             // 1 piece
      2L -> "ab12cd",         // letter/digit boundaries -> ab|12|cd = 3
      3L -> "hello,world",    // punct lookahead -> hello|,world (2 pieces, each 5+ chars: +1 +1)
      4L -> "abcdefgh",       // 8-char run: 1 piece + (8-1)/4 = 1 extra
      5L -> "")               // empty -> 0
    val got = df.select(col("doc_id"),
        graft.functions.TextFunctions.subwordCount(col("text")).as("sw"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L)
    assert(got(2L) == 3L)
    assert(got(3L) == 2L + 2L)
    assert(got(4L) == 1L + 1L)
    assert(got(5L) == 0L)
  }

  test("bigram LM scores in-distribution text above scrambled text") {
    val fluent = "the cat sat on the mat and the dog sat on the rug"
    val corpus = docsDF(
      (1L, fluent),
      (2L, "the cat sat on the rug and the dog sat on the mat"),
      (3L, "a bird sat on the mat near the dog and the cat"))
    val lm = Quality.bigramLm(corpus, "text")
    // same tokens as doc 1, order destroyed -> mostly unseen bigrams
    val scrambled = "mat the dog sat cat the on and rug the sat on the"
    val scored = Quality.bigramLmScore(
        docsDF((1L, fluent), (9L, scrambled)), "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored(1L) > scored(9L),
      s"fluent ${scored(1L)} should beat scrambled ${scored(9L)}")
    assert(scored(1L) > 0.3 && scored(1L) <= 1.0)
    // short docs produce no bigrams and are absent, not zero-scored
    val short = Quality.bigramLmScore(docsDF((7L, "single")), "doc_id", "text", lm)
    assert(short.count() == 0)
  }

  test("linearScore matches an independent scalar reimplementation") {
    val M = 2147483647L
    val A = 2654435761L % M
    val D = 4096
    def tokHash(t: String): Long =
      t.foldLeft(0L)((h, c) => (h * 31L + c.toLong) % M)
    def expected(text: String): Double = {
      val th = text.trim.split("\\s+").filter(_.nonEmpty).map(tokHash)
      if (th.length < 2) 0.5
      else {
        val ws = th.sliding(2).map { case Array(a, b) =>
          val bucket = (a * 131L + b) % M % D
          (bucket + 1L) * A % M
        }.toSeq
        val margin = (ws.sum.toDouble / ws.size) / M.toDouble * 2.0 - 1.0
        0.5 + 0.5 * margin / (1.0 + math.abs(margin))
      }
    }
    val texts = Seq("the quick brown fox", "hello", "a a a a a a",
      "Mixed CASE tokens 123 !!", "one two")
    val df = docsDF(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
    val got = df.select(col("doc_id"), Quality.linearScore(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == expected(t), s"score mismatch for '$t'")
    }
    // scores are probabilities and single-token docs are neutral
    assert(got.values.forall(s => s > 0.0 && s < 1.0))
    assert(got(1L) == 0.5)
  }
}
