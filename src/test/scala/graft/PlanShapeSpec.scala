package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression locks on the plan properties that decide whether a query
  * still works at 100 TB (SURVEY.md §4.4, SCALE.md): partition pruning
  * reaching the scan, predicate/projection pushdown into parquet, star
  * joins actually collapsing, top-k planning as TakeOrderedAndProject,
  * and small-dimension joins broadcasting. `.explain`-and-iterate,
  * captured as asserts.
  *
  * AQE is disabled per-query here (it wraps the physical plan in an
  * adaptive shell whose children are not traversable pre-execution);
  * production runs keep it on — these asserts are about the *static*
  * plan Catalyst hands AQE.
  */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark._

  private def withAqeOff[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def qe(name: String) =
    SparkEntry.queries(name)(spark, sf)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution

  private def scans(name: String): Seq[FileSourceScanExec] =
    qe(name).executedPlan.collect { case f: FileSourceScanExec => f }

  test("time-range query prunes cube partitions at planning time") {
    withAqeOff {
      val cubeScans = scans("q_ship_date_range")
        .filter(_.relation.location.rootPaths.exists(_.toString.contains("cubes/")))
      assert(cubeScans.nonEmpty, "expected the query to scan the cube")
      val s = cubeScans.head
      assert(s.partitionFilters.nonEmpty, "time predicate must become a partition filter")
      val survivors = s.relation.location.listFiles(s.partitionFilters, Nil).size
      val all = s.relation.location.listFiles(Nil, Nil).size
      assert(survivors < all,
        s"pruning kept $survivors of $all partitions — nothing was pruned")
    }
  }

  test("disjunctive time ranges prune to the union of bucket ranges, gap excluded") {
    withAqeOff {
      val cubeScans = scans("q_time_disjoint")
        .filter(_.relation.location.rootPaths.exists(_.toString.contains("cubes/")))
      assert(cubeScans.nonEmpty, "expected the query to scan the cube")
      val s = cubeScans.head
      assert(s.partitionFilters.nonEmpty, "OR of time ranges must prune buckets")
      val survivors = s.relation.location.listFiles(s.partitionFilters, Nil).size
      // two 3-month windows -> at most 6 surviving buckets; the 31-month
      // gap between them must NOT be scanned (a min/max hull would keep it)
      assert(survivors <= 6,
        s"expected <= 6 surviving buckets (two disjoint ranges), got $survivors")
    }
  }

  test("projection and predicates reach the parquet scan") {
    withAqeOff {
      val s = scans("q_select_push").head
      assert(s.metadata.getOrElse("PushedFilters", "[]") != "[]",
        "expected data filters pushed into the parquet reader")
      // a 50-column cube scan serving a narrow projection must not read
      // every column
      assert(s.requiredSchema.fieldNames.length <= 8,
        s"read schema too wide: ${s.requiredSchema.fieldNames.mkString(",")}")
    }
  }

  test("star join collapses to a single cube scan (no join in the plan)") {
    withAqeOff {
      val plan = qe("q07_nation_volume").optimizedPlan
      val joins = plan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(joins.isEmpty, s"star join survived: ${joins.size} join(s) left")
      assert(scans("q07_nation_volume").size == 1, "expected exactly one scan")
    }
  }

  test("top-k plans as TakeOrderedAndProject, not global sort") {
    withAqeOff {
      val physical = qe("q_topn_suppliers").executedPlan
      val hasTopK = physical.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }.nonEmpty
      assert(hasTopK, s"expected TakeOrderedAndProjectExec in:\n$physical")
    }
  }

  test("small dimension side of a non-star join broadcasts") {
    withAqeOff {
      val physical = qe("q13_cust_distribution").executedPlan
      val broadcasts = physical.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(broadcasts.nonEmpty,
        s"expected a broadcast hash join at sf0.001 in:\n$physical")
    }
  }

  test("grouping-sets aggregate serves from the rollup lattice") {
    withAqeOff {
      for (t <- Tables.starTables)
        Tables.t(spark, sf, t).createOrReplaceTempView(t)
      graft.cube.RollupCube.ensure(spark, sf)
      val rollupScans = scans("q_rollup")
        .filter(_.relation.location.rootPaths.exists(_.toString.contains("_rollup")))
      assert(rollupScans.nonEmpty,
        "expected GROUP BY ROLLUP over the fact table to read a rollup node")
    }
  }

  test("Q7 shape collapses and serves from the nations lattice node") {
    withAqeOff {
      for (t <- Tables.starTables)
        Tables.t(spark, sf, t).createOrReplaceTempView(t)
      graft.cube.RollupCube.ensure(spark, sf)
      val all = scans("q07_nation_volume")
      assert(all.exists(_.relation.location.rootPaths
          .exists(_.toString.contains("_rollup_nations"))),
        "q07 should serve from the nations node (year NDV from the " +
          "granularity model, not NDV(l_shipdate))")
      assert(!all.exists(_.relation.location.rootPaths
          .exists(_.toString.contains("lineitem"))),
        "q07 must not scan the fact table")
    }
  }

  test("Q5 shape serves from the order-date nations node, interval-pruned") {
    withAqeOff {
      for (t <- Tables.starTables)
        Tables.t(spark, sf, t).createOrReplaceTempView(t)
      graft.cube.RollupCube.ensure(spark, sf)
      val all = scans("q05_local_supplier")
      val node = all.filter(_.relation.location.rootPaths
        .exists(_.toString.contains("_rollup_onations")))
      assert(node.nonEmpty,
        "q05 should serve from the SECONDARY-TIME o_orderdate node " +
          "(region/nation predicates + an order-date interval)")
      assert(node.head.partitionFilters.nonEmpty,
        "the o_orderdate interval must prune the node's own buckets")
      assert(!all.exists(_.relation.location.rootPaths
          .exists(_.toString.contains("lineitem"))),
        "q05 must not scan the fact table")
    }
  }

  test("Q3 shape serves from the order-key projection node, segment + month partition-pruned") {
    withAqeOff {
      for (t <- Tables.starTables)
        Tables.t(spark, sf, t).createOrReplaceTempView(t)
      graft.cube.RollupCube.ensure(spark, sf)
      val all = scans("q03_shipping_priority")
      val node = all.filter(_.relation.location.rootPaths
        .exists(_.toString.contains("_rollup_okey")))
      assert(node.nonEmpty,
        "q03 groups at order-key grain — only the projection node can serve it")
      val s = node.head
      // the segment equality must prune the node's leaf dirs, and the
      // ship-date day literal must imply a month-dir bound (directory-level
      // pruning, not just row-group footer stats)
      def partRefs = s.partitionFilters.flatMap(_.references.map(_.name.toLowerCase))
      assert(partRefs.contains("c_mktsegment"),
        s"segment equality should be a partition filter, got: ${s.partitionFilters}")
      assert(partRefs.contains("g_tbucket"),
        s"day bound should imply a month partition bound, got: ${s.partitionFilters}")
      val survivors = s.relation.location.listFiles(s.partitionFilters, Nil).size
      val all2 = s.relation.location.listFiles(Nil, Nil).size
      assert(survivors * 4 <= all2,
        s"partition pruning kept $survivors of $all2 leaf dirs")
      assert(!all.exists(_.relation.location.rootPaths
          .exists(_.toString.contains("lineitem"))),
        "q03 must not scan the fact table")
    }
  }

  test("Q8 shape (filtered-sum market share) serves from the order-date market node") {
    withAqeOff {
      for (t <- Tables.starTables)
        Tables.t(spark, sf, t).createOrReplaceTempView(t)
      graft.cube.RollupCube.ensure(spark, sf)
      val all = scans("q08_market_share")
      assert(all.exists(_.relation.location.rootPaths
          .exists(_.toString.contains("_rollup_omarket"))),
        "q08 should serve from the o_orderdate market node — the CASE " +
          "numerator merges via the FilteredAggregationSpec rewrite")
      assert(!all.exists(_.relation.location.rootPaths
          .exists(_.toString.contains("lineitem"))),
        "q08 must not scan the fact table")
    }
  }

  test("DISTINCT dims with a dim predicate serves from the rollup lattice") {
    withAqeOff {
      for (t <- Tables.starTables)
        Tables.t(spark, sf, t).createOrReplaceTempView(t)
      graft.cube.RollupCube.ensure(spark, sf)
      val all = scans("q_search_dims")
      val rollupScans = all.filter(_.relation.location.rootPaths
        .exists(_.toString.contains("_rollup")))
      assert(rollupScans.nonEmpty,
        "expected the Druid-search-shape DISTINCT to read a rollup node")
      val factScans = all.filter(_.relation.location.rootPaths.exists(p =>
        !p.toString.contains("_rollup")))
      assert(factScans.isEmpty, "DISTINCT must not touch fact-grain data")
    }
  }

  // an earlier suite may have `.cache()`d the embeddings table (suites share
  // the session); cache substitution replaces the parquet scan with an
  // InMemoryTableScan and these locks are about the *parquet* plan
  private def withUncachedEmbeddings[A](body: => A): A = {
    Tables.t(spark, sf, "embeddings").unpersist(blocking = true)
    body
  }

  // the pipeline tables ship as one row group at test scale, so Tables.t
  // inserts a round-robin input rebalance (scan-parallelism guard — see
  // Tables.rebalanced); it is the one exchange these locks tolerate beyond
  // what the operator itself needs. Exactly ONE round-robin exchange is
  // exempted — a second one (some future mid-pipeline repartition) still
  // counts, so the locks stay exact.
  private def nonRebalanceShuffles(plan: org.apache.spark.sql.execution.SparkPlan) = {
    val (rr, rest) = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.partition(_.outputPartitioning
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning])
    rest ++ rr.drop(1)
  }

  test("quantization is a pure projection: no shuffle except the output sort") {
    withAqeOff { withUncachedEmbeddings {
      val shuffles = nonRebalanceShuffles(qe("q_vec_quant").executedPlan)
      // one range exchange for the ORDER BY; the quantize/summarize math
      // itself must stay row-local
      assert(shuffles.size <= 1,
        s"expected at most the sort exchange, got ${shuffles.size}")
      val s = scans("q_vec_quant").head
      assert(s.requiredSchema.fieldNames.toSet == Set("vec_id", "embedding"),
        s"scan should read only id+vector: ${s.requiredSchema.fieldNames.mkString(",")}")
    } }
  }

  test("kmeans IVF probe: single corpus scan, top-k without a global sort") {
    withAqeOff { withUncachedEmbeddings {
      val plan = qe("q_ann_kmeans").executedPlan
      assert(scans("q_ann_kmeans").size == 1, "probe must scan the corpus once")
      val topk = plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }
      assert(topk.nonEmpty, "rank+limit must plan as TakeOrderedAndProject")
      val shuffles = nonRebalanceShuffles(plan)
      assert(shuffles.isEmpty,
        s"bucket filter + top-k needs no exchange, got ${shuffles.size}")
    } }
  }

  test("knnJoin candidate exchanges carry ids only, never embedding vectors") {
    withAqeOff { withUncachedEmbeddings {
      val plan = qe("q_knn_join").executedPlan
      // candidate-generation exchanges are the multi-key ones: the band
      // join partitions on (g_band, g_bucket), the pair dedup on
      // (g_qid, g_nid). Those carry candidate-cardinality rows, so a vector
      // column crossing them would widen the shuffle ~dim×4 bytes per row
      // — the re-attach joins (single id key, survivor-bounded or
      // broadcast) are where arrays are allowed back in.
      val multiKey = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if (e.outputPartitioning match {
            case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
              h.expressions.size >= 2
            case _ => false
          }) => e
      }
      assert(multiKey.nonEmpty, "expected band-join/pair-dedup exchanges")
      for (e <- multiKey)
        assert(!e.output.exists(_.dataType
            .isInstanceOf[org.apache.spark.sql.types.ArrayType]),
          s"candidate exchange must not carry an array column: ${e.output.map(a => s"${a.name}:${a.dataType.simpleString}").mkString(", ")}")
    } }
  }

  test("gopher repetition never cross-joins and bounds its shuffle count") {
    withAqeOff {
      val plan = qe("q_text_gopher").executedPlan
      val cartesian = plan.collect {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }
      assert(cartesian.isEmpty, "per-doc stats must join keyed, never cross")
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // the repetition stats are array folds (pure projection); only the
      // final ORDER BY and the tiny stats join may exchange
      assert(shuffles.size <= 2,
        s"per-doc stats must stay a projection, got ${shuffles.size} exchanges")
    }
  }

  test("span dedup joins hash-keyed with no cartesian and bounded exchanges") {
    withAqeOff {
      val plan = qe("q_span_dedup").executedPlan
      val cartesian = plan.collect {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }
      assert(cartesian.isEmpty, "window matching must equi-join on the hash")
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // window-count agg + covered-per-doc agg + final sort, plus up to
      // three scan-parallelism rebalances — never a per-pair blowup
      assert(shuffles.size <= 6,
        s"span dedup must shuffle only hash keys, got ${shuffles.size} exchanges")
    }
  }

  test("selective dim filter injects a runtime bloom filter on the fact side") {
    // the non-star fallback path at 100 TB: when a join does NOT collapse
    // into the cube, a selective dimension predicate must still reach the
    // fact scan before the shuffle — Spark's InjectRuntimeFilter builds a
    // bloom filter from the filtered dim side and semi-filters the fact
    // side with it. Thresholds are sized for clusters, so pin them down to
    // make the lock assertable at test scale; broadcast is disabled because
    // at 100 TB this join IS a shuffle join.
    val pins = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = pins.map { case (k, _) => k -> spark.conf.getOption(k) }
    pins.foreach { case (k, v) => spark.conf.set(k, v) }
    try Graft.withoutRewrites(spark) {
      val li = Tables.t(spark, sf, "lineitem")
      val ord = Tables.t(spark, sf, "orders")
        .filter(col("o_totalprice") > 500000.0)
      val agg = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").agg(sum("l_quantity"))
      val blooms = agg.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.optimizedPlan.collect {
          case p => p.expressions.flatMap(_.collect {
            case b: org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain => b
          })
        }.flatten
      assert(blooms.nonEmpty,
        "expected InjectRuntimeFilter to semi-filter the fact side")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("always-false time interval folds to an empty local relation (zero tasks)") {
    withAqeOff {
      for (t <- Tables.starTables)
        Tables.t(spark, sf, t).createOrReplaceTempView(t)
      graft.cube.RollupCube.ensure(spark, sf)
      val df = spark.sql(
        """SELECT l_returnflag, count(*) AS cnt FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          |  AND l_shipdate < TIMESTAMP '1997-01-01'
          |GROUP BY l_returnflag""".stripMargin)
      val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.optimizedPlan
      val hasScan = plan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
      }.nonEmpty
      assert(!hasScan, s"contradictory interval should scan nothing:\n$plan")
      assert(df.count() == 0)
    }
  }
}
