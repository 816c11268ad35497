package graft

import org.apache.spark.sql.graft.FreqSketch
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests for the Misra-Gries buffer: the classic guarantees
  * must hold for EVERY stream and EVERY split of it, not just hand-built
  * cases — (1) stored counts bracket true counts within `err`, (2) any item
  * above n/(k+1) survives, (3) merging a split equals the one-pass sketch
  * while unsaturated, and (4) serialization round-trips. 200 seeded random
  * streams per property (deterministic — no flakiness).
  */
class FreqSketchPropSpec extends AnyFunSuite {

  private def stream(rnd: scala.util.Random): List[String] = {
    val n = rnd.nextInt(401)
    // zipfian-ish mix: a few hot values among a modest alphabet
    List.fill(n) {
      val r = rnd.nextInt(100)
      if (r < 30) "hot" + rnd.nextInt(3) else "v" + rnd.nextInt(40)
    }
  }

  test("counts bracket the truth within err; heavy items survive") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 200) {
      val xs = stream(rnd)
      val k = 8 + rnd.nextInt(57)
      val b = new FreqSketch.Buffer(k)
      xs.foreach(x => b.add(x))
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      b.counts.forEach { (item, c) =>
        val t = truth(item)
        assert(c <= t && c + b.err >= t,
          s"item $item: stored $c err ${b.err} true $t (k=$k)")
      }
      val n = xs.size.toLong
      truth.foreach { case (item, t) =>
        if (t > n / (k + 1))
          assert(b.counts.containsKey(item), s"heavy item $item (count $t) lost (k=$k)")
      }
    }
  }

  test("merge of any split == one-pass sketch when k exceeds the NDV") {
    val rnd = new scala.util.Random(777)
    for (_ <- 1 to 200) {
      val xs = stream(rnd)
      val cut = if (xs.isEmpty) 0 else rnd.nextInt(xs.size + 1)
      val k = 64 // > 43 possible distinct values: never saturates
      val (l, r) = xs.splitAt(cut)
      val a = new FreqSketch.Buffer(k)
      val b = new FreqSketch.Buffer(k)
      val whole = new FreqSketch.Buffer(k)
      l.foreach(x => a.add(x)); r.foreach(x => b.add(x)); xs.foreach(x => whole.add(x))
      val merged = a.merge(b)
      assert(merged.err == 0L && merged.counts == whole.counts)
    }
  }

  test("weighted updates: totals bracket within err, exact below k") {
    val rnd = new scala.util.Random(1313)
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(300)
      val xs = List.fill(n)(("w" + rnd.nextInt(30), rnd.nextInt(1000).toLong + 1L))
      val b = new FreqSketch.Buffer(64) // > 30 distinct: exact
      xs.foreach { case (item, w) => b.add(item, w) }
      val truth = xs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(b.err == 0L)
      truth.foreach { case (item, t) =>
        assert(b.counts.get(item) == t, s"item $item: ${b.counts.get(item)} vs $t")
      }
    }
  }

  test("serialization round-trips counts, err and k") {
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 200) {
      val xs = stream(rnd)
      val k = 8 + rnd.nextInt(25)
      val b = new FreqSketch.Buffer(k)
      xs.foreach(x => b.add(x))
      val rt = FreqSketch.deserialize(b.serialize)
      assert(rt.k == b.k && rt.err == b.err && rt.counts == b.counts)
    }
  }
}
