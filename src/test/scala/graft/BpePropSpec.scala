package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** Property differential for BPE: the distributed trainer and the
  * replace-chain encoder must agree with a naive in-memory reference
  * implementation (greedy left-to-right merges over symbol vectors — the
  * textbook algorithm, no string tricks) for EVERY corpus, not just the
  * hand-built Sennrich case. 30 seeded random corpora (deterministic).
  */
class BpePropSpec extends AnyFunSuite {
  import TestSpark._

  // ---- naive reference: symbols as vectors, merges by scan ----
  private def refWordSyms(word: String): Vector[String] =
    word.map(_.toString).toVector :+ Bpe.EndWord

  private def refMergeOnce(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refLearn(wordCounts: Map[String, Long], nMerges: Int,
                       minFreq: Long): (Seq[(String, String)], Map[Vector[String], Long]) = {
    var words: Map[Vector[String], Long] =
      wordCounts.map { case (w, c) => refWordSyms(w) -> c }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var continue = true
    while (k < nMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= minFreq =>
          merges += ((l, r))
          words = words.groupMapReduce { case (syms, _) => refMergeOnce(syms, l, r) }(_._2)(_ + _)
          k += 1
        case _ => continue = false
      }
    }
    (merges.result(), words)
  }

  private def refEncode(text: String, merges: Seq[(String, String)]): Vector[String] = {
    val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    words.toVector.flatMap { w =>
      merges.foldLeft(refWordSyms(w)) { case (s, (l, r)) => refMergeOnce(s, l, r) }
    }
  }

  private def corpus(rnd: scala.util.Random): Seq[String] = {
    val alphabet = "abcd"
    def word() = (0 until 1 + rnd.nextInt(6))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    // small alphabet + repeated draws -> dense pair collisions and ties
    (0 until 3 + rnd.nextInt(8))
      .map(_ => (0 until 1 + rnd.nextInt(10)).map(_ => word()).mkString(" "))
  }

  test("trainer and encoder match the naive reference on random corpora") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    val rnd = new scala.util.Random(90217)
    for (trial <- 1 to 30) {
      val docs = corpus(rnd)
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val nMerges = 1 + rnd.nextInt(8)
      val got = Bpe.learnMerges(df, "text", nMerges, minFreq = 2)
      val wc = docs.flatMap(_.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (want, _) = refLearn(wc, nMerges, minFreq = 2)
      assert(got == want, s"trial $trial: merges $got != $want (corpus $docs)")

      // encode every doc with the learned table; tokens must match the
      // reference's greedy merge application exactly
      val enc = df.select(col("doc_id"), Bpe.encode(col("text"), got).as("s"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      for ((t, i) <- docs.zipWithIndex) {
        val gotToks = enc(i.toLong).split(" ").filter(_.nonEmpty)
          .map(_.replace(Bpe.S, "")).toVector
        val wantToks = refEncode(t, got)
        assert(gotToks == wantToks,
          s"trial $trial doc $i: $gotToks != $wantToks (text '$t', merges $got)")
      }
    }
  }
}
