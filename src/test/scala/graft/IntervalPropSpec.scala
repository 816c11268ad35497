package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cube.{Interval, IntervalSet}

/** Property tests for the interval algebra (SURVEY.md §5: the reference's
  * `QueryIntervals` semantics): set operations must agree with pointwise
  * membership for EVERY operand shape, and every constructed set must hold
  * the normalization invariant — sorted, pairwise disjoint, non-empty
  * members. 500 seeded random cases per property (deterministic).
  */
class IntervalPropSpec extends AnyFunSuite {

  private def randSet(rnd: scala.util.Random): IntervalSet = {
    val n = rnd.nextInt(5)
    IntervalSet(Seq.fill(n) {
      val a = rnd.nextInt(200) - 100
      val b = a + rnd.nextInt(60) - 10 // sometimes empty (b <= a)
      Interval(a.toLong, b.toLong)
    }: _*)
  }

  private def member(s: IntervalSet, p: Long): Boolean =
    s.intervals.exists(_.contains(p))

  private val probes: Seq[Long] = (-120L to 160L by 1L)

  test("normalization: sorted, disjoint, non-empty after any construction") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val s = randSet(rnd)
      assert(s.intervals.forall(!_.isEmpty))
      for (Seq(a, b) <- s.intervals.sliding(2).toSeq if s.intervals.size >= 2)
        assert(a.endUs < b.startUs, s"overlapping/adjacent kept: $s")
    }
  }

  test("intersect and union agree with pointwise membership") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 500) {
      val (a, b) = (randSet(rnd), randSet(rnd))
      val i = a.intersect(b)
      val u = a.union(b)
      for (p <- probes) {
        assert(member(i, p) == (member(a, p) && member(b, p)),
          s"intersect broken at $p: $a ∩ $b = $i")
        assert(member(u, p) == (member(a, p) || member(b, p)),
          s"union broken at $p: $a ∪ $b = $u")
      }
    }
  }

  test("algebraic identities: commutativity, All/Empty units, idempotence") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 500) {
      val (a, b) = (randSet(rnd), randSet(rnd))
      assert(a.intersect(b) == b.intersect(a))
      assert(a.union(b) == b.union(a))
      assert(a.intersect(IntervalSet.All) == a)
      assert(a.intersect(IntervalSet.Empty).isEmpty)
      assert(a.union(IntervalSet.Empty) == a)
      assert(a.intersect(a) == a)
      assert(a.union(a) == a)
    }
  }

  test("cardinality estimator: determined columns free, product-bounded, order-free") {
    import graft.cube.{FunctionalDependencies => FD, FunctionalDependency, RelType}
    val rnd = new scala.util.Random(23)
    val names = ('a' to 'h').map(_.toString)
    for (_ <- 1 to 500) {
      val deps = Seq.fill(rnd.nextInt(4)) {
        val f = names(rnd.nextInt(names.size))
        val t = names(rnd.nextInt(names.size))
        FunctionalDependency(f, t,
          if (rnd.nextBoolean()) RelType.ManyToOne else RelType.OneToOne)
      }.filter(d => d.from != d.to)
      // CONSISTENT stats: a determined column cannot have more distinct
      // values than its determiner (n-1: card(to) <= card(from); 1-1:
      // equal). With inconsistent declared NDVs the estimator's tie-breaks
      // are order-dependent by design (same as the reference) — the
      // properties below are claims about consistent metadata.
      var card = names.map(n => n -> (1L + rnd.nextInt(1000))).toMap
      for (_ <- 1 to 10; d <- deps) d.relType match {
        case RelType.ManyToOne =>
          card += d.to -> math.min(card(d.to), card(d.from))
        case RelType.OneToOne =>
          val m = math.min(card(d.to), card(d.from))
          card += d.to -> m; card += d.from -> m
      }
      val cols = rnd.shuffle(names.toList).take(1 + rnd.nextInt(5))

      val est = FD.estimateCardinality(cols, card, deps)
      // bounded by the plain NDV product (dependencies only ever shrink)
      val product = cols.map(card).map(BigInt(_)).product
      assert(BigInt(est) <= product, s"est $est > product $product for $cols / $deps")
      assert(est >= cols.map(card).max, s"est below the largest single NDV")
      // order-independent
      assert(FD.estimateCardinality(rnd.shuffle(cols), card, deps) == est)
      // adding a column determined (n-1) by a retained one changes nothing
      deps.collectFirst {
        case FunctionalDependency(f, t, RelType.ManyToOne)
            if cols.contains(f) && !cols.contains(t) => t
      }.foreach { t =>
        assert(FD.estimateCardinality(cols :+ t, card, deps) == est,
          s"determined column $t changed the estimate for $cols / $deps")
      }
    }
  }

  test("ofComparison brackets: accumulated bounds equal the closed form") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 500) {
      val lo = rnd.nextInt(100).toLong
      val hi = lo + rnd.nextInt(100).toLong
      val s = IntervalSet.All
        .intersect(IntervalSet.ofComparison(">=", lo))
        .intersect(IntervalSet.ofComparison("<", hi))
      if (lo >= hi) assert(s.isEmpty)
      else assert(s.intervals == Vector(Interval(lo, hi)))
      // strict vs inclusive pointwise
      for (p <- Seq(lo - 1, lo, lo + 1, hi - 1, hi, hi + 1))
        assert(member(IntervalSet.ofComparison(">", lo), p) == (p > lo))
      for (p <- Seq(lo - 1, lo, lo + 1))
        assert(member(IntervalSet.ofComparison("<=", lo), p) == (p <= lo))
      for (p <- Seq(lo - 1, lo, lo + 1))
        assert(member(IntervalSet.ofComparison("=", lo), p) == (p == lo))
    }
  }

  test("ofComparison saturates at Long.MaxValue: upper bounds degrade to " +
       "All, never wrap to an empty set") {
    val m = Long.MaxValue
    // `<=` / `=` at the universe end must NOT produce an empty interval (a
    // wrapped `us + 1` would): a saturated lag implication near the max
    // representable timestamp degrades to no-pruning, not a wrong null scan.
    assert(IntervalSet.ofComparison("<=", m) == IntervalSet.All)
    assert(!IntervalSet.ofComparison("=", m).isEmpty)
    assert(member(IntervalSet.ofComparison("<=", m), m - 1))
    // `>` / `>=` at the end are genuinely empty (half-open universe: the
    // end sentinel itself is not a representable member) — sound, since
    // lower bounds only ever saturate DOWN (to MinValue) on overflow.
    assert(IntervalSet.ofComparison(">", m).isEmpty)
    assert(IntervalSet.ofComparison(">=", m).isEmpty)
  }
}
