package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cube._

class CubeModelSpec extends AnyFunSuite {
  import RelType._

  test("star schema validation: valid tree") {
    assert(TpchCube.starSchema.validate().isEmpty)
  }

  test("star schema validation: two parents rejected") {
    val s = StarSchema("f", Seq(
      StarRelation("f", "d", ManyToOne, Seq(EqualityCondition("a", "b"))),
      StarRelation("x", "d", ManyToOne, Seq(EqualityCondition("c", "b")))))
    assert(s.validate().exists(_.contains("more than one parent")))
  }

  test("star schema validation: unreachable table rejected") {
    val s = StarSchema("f", Seq(
      StarRelation("x", "y", ManyToOne, Seq(EqualityCondition("a", "b")))))
    assert(s.validate().exists(_.contains("does not reach")))
  }

  test("starEdge matches key sets in either orientation") {
    val s = TpchCube.starSchema
    assert(s.starEdge("lineitem", "orders", Set(("l_orderkey", "o_orderkey"))).isDefined)
    assert(s.starEdge("orders", "lineitem", Set(("o_orderkey", "l_orderkey"))).isDefined)
    assert(s.starEdge("lineitem", "orders", Set(("l_partkey", "o_orderkey"))).isEmpty)
    // subset of a multi-key edge must not match
    val multi = StarSchema("f", Seq(StarRelation("f", "d", ManyToOne,
      Seq(EqualityCondition("k1", "p1"), EqualityCondition("k2", "p2")))))
    assert(multi.starEdge("f", "d", Set(("k1", "p1"))).isEmpty)
    assert(multi.starEdge("f", "d", Set(("k1", "p1"), ("k2", "p2"))).isDefined)
  }

  test("functional dependencies collapse determined columns") {
    val card = Map("c_nation" -> 25L, "c_region" -> 5L, "c_name" -> 1000L)
    val deps = Seq(
      FunctionalDependency("c_nation", "c_region", ManyToOne),
      FunctionalDependency("c_name", "c_nation", ManyToOne))
    assert(FunctionalDependencies.estimateCardinality(
      Seq("c_nation", "c_region"), card, deps) == 25L)
    assert(FunctionalDependencies.estimateCardinality(
      Seq("c_nation"), card, deps) == 25L)
    // transitive: c_name determines c_region through c_nation
    assert(FunctionalDependencies.estimateCardinality(
      Seq("c_name", "c_nation", "c_region"), card, deps) == 1000L)
    // independent columns multiply
    assert(FunctionalDependencies.estimateCardinality(
      Seq("c_nation", "c_name"), card,
      Seq(FunctionalDependency("c_nation", "c_region", ManyToOne))) == 25000L)
  }

  test("1-1 dependency keeps exactly one side") {
    val card = Map("a" -> 10L, "b" -> 10L)
    val deps = Seq(FunctionalDependency("a", "b", OneToOne))
    assert(FunctionalDependencies.estimateCardinality(Seq("a", "b"), card, deps) == 10L)
  }

  test("interval algebra: intersect, union, normalize, empties") {
    val a = IntervalSet(Interval(0, 100))
    val b = IntervalSet(Interval(50, 150))
    assert(a.intersect(b).intervals == Vector(Interval(50, 100)))
    assert(a.union(b).intervals == Vector(Interval(0, 150)))
    assert(IntervalSet(Interval(0, 10)).intersect(IntervalSet(Interval(20, 30))).isEmpty)
    assert(IntervalSet(Interval(5, 5)).isEmpty)
    // comparison accumulation: x >= 10 AND x < 20
    val ivs = IntervalSet.All
      .intersect(IntervalSet.ofComparison(">=", 10))
      .intersect(IntervalSet.ofComparison("<", 20))
    assert(ivs.intervals == Vector(Interval(10, 20)))
    // equality
    assert(IntervalSet.ofComparison("=", 7).intervals == Vector(Interval(7, 8)))
    // disjoint constraints fold to empty (null scan)
    assert(IntervalSet.ofComparison("<", 5)
      .intersect(IntervalSet.ofComparison(">", 10)).isEmpty)
  }

  test("bucketOfMicros maps month boundaries correctly") {
    def us(s: String): Long =
      java.time.Instant.parse(s).toEpochMilli * 1000L
    assert(TpchCube.bucketOfMicros(us("1970-01-01T00:00:00Z")) == 0)
    assert(TpchCube.bucketOfMicros(us("1970-02-01T00:00:00Z")) == 1)
    assert(TpchCube.bucketOfMicros(us("1996-01-31T23:59:59Z")) == 312)
    assert(TpchCube.bucketOfMicros(us("1996-02-01T00:00:00Z")) == 313)
    // one microsecond before a boundary stays in the earlier bucket
    assert(TpchCube.bucketOfMicros(us("1996-02-01T00:00:00Z") - 1) == 312)
  }
}
