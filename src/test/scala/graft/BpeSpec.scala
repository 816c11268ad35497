package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** Differential lock for BPE training: the classic Sennrich corpus
  * (low×5, lower×2, newest×6, widest×3) has a hand-computable merge
  * sequence; encoding invariants (count conservation, idempotent re-apply)
  * hold on real data.
  */
class BpeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val corpus = Seq(
    // one doc per word occurrence — weights come from repetition
    Seq.fill(5)("low"), Seq.fill(2)("lower"),
    Seq.fill(6)("newest"), Seq.fill(3)("widest")
  ).flatten.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    .toDF("doc_id", "text")

  test("merge sequence matches the hand-computed Sennrich example") {
    val merges = Bpe.learnMerges(corpus, "text", nMerges = 5, minFreq = 2)
    // pair counts, round 1: (e,s)=9, (s,t)=9, (t,</w>)=9, (l,o)=7, (o,w)=7,
    // (w,e)=2+6=8, (n,e)=6, (e,w)=6, (w,i)=3, (i,d)=3, (d,e)=3, (e,r)=2,
    // (r,</w>)=2, (w,</w>)=5
    // ties at 9 break lexicographically: ("e","s") < ("s","t") < ("t","</w>")
    assert(merges.head == ("e", "s"))
    // round 2: es+t occurs 9 times -> ("es","t") wins (9, lex "es" > ...)
    assert(merges(1) == ("es", "t"))
    // round 3: est+</w> 9 times
    assert(merges(2) == ("est", "</w>"))
    // round 4: (l,o)=7, (o,w)=7, (w,est</w>)=6, (w,e)=2 ... tie at 7 ->
    // ("l","o") before ("o","w")
    assert(merges(3) == ("l", "o"))
    // round 5: (lo,w)=7 now the max
    assert(merges(4) == ("lo", "w"))
  }

  test("encoding with the learned table merges trained words fully") {
    val merges = Bpe.learnMerges(corpus, "text", nMerges = 8, minFreq = 2)
    val enc = corpus.limit(1).select(
      Bpe.encode(lit("low lowest"), merges).as("sym")).head().getString(0)
    val toks = enc.split(" ").map(_.replace(Bpe.S, "")).toSeq
    // "low" is fully merged after (l,o),(lo,w),(low,</w>)... depending on
    // learned depth; at minimum the est</w> unit from "newest/widest"
    // generalizes to the unseen word "lowest"
    assert(toks.contains("est</w>"), s"got $toks")
    assert(toks.head.startsWith("lo"), s"got $toks")
  }

  test("token count conserves: no merges = character+endword count") {
    val docs = Tables.t(spark, sf, "documents").limit(50)
    val plain = docs.select(
      Bpe.bpeTokenCount(Bpe.symbolize(col("text"))).as("n0"),
      Bpe.bpeTokenCount(Bpe.encode(col("text"), Seq(("e", "s")))).as("n1"))
      .agg(sum("n0").as("s0"), sum("n1").as("s1")).head()
    // every applied merge reduces the count; with one merge s1 <= s0
    assert(plain.getLong(1) <= plain.getLong(0))
    assert(plain.getLong(0) > 0)
  }

  test("encodeIds: dense ids round-trip the vocab; unknown symbols are -1") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    val merges = Bpe.learnMerges(corpus, "text", nMerges = 5, minFreq = 2)
    val v = Bpe.vocab(corpus, "text", merges)
    assert(v.map(_._2) == v.indices, "ids must be dense and 0-based")
    val byId = v.map(_.swap).toMap
    val ids = corpus.limit(1)
      .select(Bpe.encodeIds(lit("low"), merges, v).as("ids"))
      .head().getSeq[Int](0)
    // decode back through the vocab and reassemble the word
    val decoded = ids.map(byId).mkString("")
    assert(decoded == "low" + Bpe.EndWord, s"ids $ids decoded to $decoded")
    // a character the corpus never saw maps to -1, loudly
    val unk = corpus.limit(1)
      .select(Bpe.encodeIds(lit("zzz9"), merges, v).as("ids"))
      .head().getSeq[Int](0)
    assert(unk.contains(-1), s"expected an unknown id in $unk")
  }

  test("astral characters symbolize as whole code points, not surrogates") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    val cyclone = new String(Character.toChars(0x1F300))
    val sym = Seq(Tuple1(s"a${cyclone}b")).toDF("text")
      .select(Bpe.symbolize(col("text")).as("s")).head().getString(0)
    val symbols = sym.split(" ").filter(_.nonEmpty).map(_.replace(Bpe.S, ""))
    // four symbols: a, the full emoji (one piece, 2 UTF-16 units), b, </w>
    assert(symbols.toSeq == Seq("a", cyclone, "b", Bpe.EndWord), symbols.toSeq)
  }

  test("bounded-chain training equals the naive full-replay chain") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    val rnd = new scala.util.Random(48112)
    val alphabet = "abc"
    def word() = (0 until 1 + rnd.nextInt(5))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val docs = (0 until 12)
      .map(i => (i.toLong, (0 until 1 + rnd.nextInt(12)).map(_ => word()).mkString(" ")))
      .toDF("doc_id", "text")
    // naive = rematerializeEvery larger than nMerges (never triggers);
    // chunked = rematerialize every 3 merges. Identical merge tables means
    // the lineage truncation is pure mechanics, zero semantics.
    val naive = Bpe.learnMerges(docs, "text", nMerges = 11, minFreq = 2,
      rematerializeEvery = 1000)
    val chunked = Bpe.learnMerges(docs, "text", nMerges = 11, minFreq = 2,
      rematerializeEvery = 3)
    assert(naive.nonEmpty && chunked == naive, s"$chunked != $naive")
  }

  test("batched trainer at batch=1 is exactly the sequential trainer") {
    val seq1 = Bpe.learnMerges(corpus, "text", nMerges = 8, minFreq = 2)
    val b1 = Bpe.learnMergesBatched(corpus, "text", nMerges = 8,
      minFreq = 2, batch = 1)
    assert(seq1.nonEmpty && b1 == seq1, s"$b1 != $seq1")
  }

  test("batched trainer bounds the scheduled job count (~nMerges/batch rounds)") {
    val docs = Tables.t(spark, sf, "documents").limit(50).cache()
    docs.count()
    val sc = spark.sparkContext
    def jobsOf(group: String)(body: => Unit): Int = {
      sc.setJobGroup(group, group)
      try body finally sc.clearJobGroup()
      // the status store updates asynchronously — poll until stable
      var last = -1
      var cur = sc.statusTracker.getJobIdsForGroup(group).length
      while (cur != last) {
        last = cur; Thread.sleep(200)
        cur = sc.statusTracker.getJobIdsForGroup(group).length
      }
      cur
    }
    var seqTable: Seq[(String, String)] = Seq.empty
    var batchTable: Seq[(String, String)] = Seq.empty
    val seqJobs = jobsOf("bpe-seq") {
      seqTable = Bpe.learnMerges(docs, "text", nMerges = 24, minFreq = 2)
    }
    val batchJobs = jobsOf("bpe-batch") {
      batchTable = Bpe.learnMergesBatched(docs, "text", nMerges = 24,
        minFreq = 2, batch = 8)
    }
    assert(seqTable.size == 24 && batchTable.size == 24,
      s"seq=${seqTable.size} batch=${batchTable.size}")
    // the 32k bound: one count job per ROUND, not per merge — with
    // batch=8 the batched run must schedule well under half the
    // sequential run's jobs (coarse bound; AQE may add jobs per round)
    assert(batchJobs * 2 < seqJobs,
      s"batched scheduled $batchJobs jobs vs sequential $seqJobs")
    // deterministic for a given (corpus, batch)
    val again = Bpe.learnMergesBatched(docs, "text", nMerges = 24,
      minFreq = 2, batch = 8)
    assert(again == batchTable)
    docs.unpersist()
    ()
  }

  test("live replace chain never exceeds rematerializeEvery (structural bound)") {
    var maxChain = -1
    Bpe.learnMergesProbed(corpus, "text", nMerges = 7, minFreq = 1,
      rematerializeEvery = 2, len => maxChain = math.max(maxChain, len))
    // the probe reports the chain length each iteration AFTER any
    // rematerialization — per-merge work is O(rematerializeEvery), not O(i)
    assert(maxChain >= 0 && maxChain < 2, s"live chain reached $maxChain")
  }

  test("line separators that survive tokenization stay their own symbol") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    // Java regex \s is [ \t\n\x0B\f\r] only, so U+2028 LINE SEPARATOR
    // survives \s+ tokenization inside a "word" — and without (?s) the
    // per-code-point split's `.` would not match it, fusing it with the
    // following character into one symbol.
    val sep = "\u2028"
    val sym = Seq(Tuple1(s"a${sep}b")).toDF("text")
      .select(Bpe.symbolize(col("text")).as("s")).head().getString(0)
    val symbols = sym.split(" ").filter(_.nonEmpty).map(_.replace(Bpe.S, ""))
    assert(symbols.toSeq == Seq("a", sep, "b", Bpe.EndWord), symbols.toSeq)
  }

  test("re-applying the same merge table is a no-op (idempotent encode)") {
    val merges = Seq(("e", "s"), ("es", "t"), ("t", "h"))
    val docs = Tables.t(spark, sf, "documents").limit(50)
    val twice = docs.select(
      Bpe.encode(col("text"), merges).as("a"),
      Bpe.applyMerges(Bpe.encode(col("text"), merges), merges).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(twice == 0)
  }
}
