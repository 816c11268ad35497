package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.cube.{CubeCatalog, RegisteredCube}

/** Collapse inner equi-join subtrees that are subgraphs of a registered
  * star schema into a single scan of the materialized flat cube.
  *
  * This is the Spark-native re-expression of the reference's join
  * elimination (`JoinTransform.scala:305-442`, validation
  * `StarSchemaInfo.scala:215-275`, `JoinTransform.scala:41-107`): instead of
  * emitting a Druid query, we substitute the join tree with a
  * `Project(Filter(cubeScan))` whose output preserves the original
  * attribute ids, so the surrounding plan (Aggregate/Sort/...) is untouched.
  * Filters from the dimension legs and non-star ("theta") join residuals
  * become ordinary filters over the cube's mapped columns; Catalyst then
  * pushes them into the parquet scan. `IsNotNull` on collapsed join keys is
  * dropped — the inner-join guarantee of the reference's `NoopFilterSpec`
  * trick (`DruidQueryBuilder.scala:97-121`).
  *
  * Correctness contract (same as the reference): star edges declared in the
  * schema have referential integrity — every fact row matches exactly one
  * row of each n-1 dimension — so collapsing a join over any subset of the
  * dimensions preserves the row multiset.
  */
case class StarJoinElimination(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  import StarJoinElimination.granCount

  /** Cardinality-gate veto scope. STRICTLY per-`apply`-invocation: plan
    * leaves are SHARED tree instances (table/plan caches, reused
    * DataFrames), so a persistent mark — e.g. a TreeNode tag — on a
    * refused subtree would leak the veto into every later query that
    * scans the same relation and silently disable routing session-wide.
    */
  private val refusedScope =
    new ThreadLocal[java.util.Set[LogicalPlan]] {
      override def initialValue(): java.util.Set[LogicalPlan] =
        java.util.Collections.newSetFromMap(
          new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean])
    }
  private def refused: java.util.Set[LogicalPlan] = refusedScope.get()

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (CubeCatalog.isEmpty) return plan
    // session-conf surface (reference: spark.sparklinedata.* options,
    // `DruidPlanner.scala:59-160`)
    if (!spark.conf.get("spark.graft.starJoin.enabled", "true").toBoolean)
      return plan
    refused.clear()
    RewriteStats.counted("starJoinElimination", plan)(_.transformDown {
      // complex grouping keys: the analyzer's PullOutGroupingExpressions
      // puts them in a Project below the Aggregate; the cardinality gate
      // must see the INLINED grouping expressions (their base-column
      // references), or the collapse would later happen through the
      // gateless Project case below
      case a @ Aggregate(_, _, p @ Project(projList, gchild), _)
          if !refused.contains(a) &&
            projList.exists {
              case al: Alias => !al.child.isInstanceOf[Attribute]
              case _         => false
            } =>
        val aliasMap = projList.collect {
          case al @ Alias(e, _) => al.exprId -> e
        }.toMap
        val inlined = a.groupingExpressions.map(_.transformUp {
          case at: Attribute if aliasMap.contains(at.exprId) => aliasMap(at.exprId)
        })
        rewrite(gchild, p.references, Some(inlined), aggExprsOf(a))
          .map(c => a.copy(child = p.copy(child = c))).getOrElse(a)
      case p @ Project(_, child) if !refused.contains(p) =>
        rewrite(child, p.references, None).map(c => p.copy(child = c)).getOrElse(p)
      // grouping sets / cube / rollup arrive as Aggregate over Expand
      // (reference: one Druid query per Expand projection,
      // `AggregateTransform.scala:98-167`; ours: ONE cube scan feeding the
      // native Expand, no per-projection re-scan). The gate sees the
      // per-projection values of the slots the aggregate actually groups
      // by — the real grouping keys of the finest grouping set.
      case a @ Aggregate(_, _, e: Expand, _) if !refused.contains(a) =>
        val gSlots = a.groupingExpressions.flatMap(_.references.toSeq)
          .map(at => e.output.indexWhere(_.exprId == at.exprId)).filter(_ >= 0)
        val gVals = gSlots.flatMap(i => e.projections.map(_(i)))
          .filterNot(_.isInstanceOf[Literal]).distinct
        rewrite(e.child, e.references, Some(gVals), aggExprsOf(a))
          .map(c => a.copy(child = e.copy(child = c))).getOrElse(a)
      case a: Aggregate if !refused.contains(a) =>
        rewrite(a.child, a.references, Some(a.groupingExpressions), aggExprsOf(a))
          .map(c => a.copy(child = c)).getOrElse(a)
    })
  }

  /** The aggregate functions an Aggregate computes — the bare-fact benefit
    * gate checks each one against a lattice node's serve capabilities.
    */
  private def aggExprsOf(a: Aggregate): Seq[aggregate.AggregateExpression] =
    a.aggregateExpressions.flatMap(_.collect {
      case ae: aggregate.AggregateExpression => ae
    })

  /** One base-table scan leaf of the join tree (`output` is the leaf's
    * attribute set as seen by the surrounding plan — the relation's own
    * output, or the `InMemoryRelation` output for a cached table).
    */
  private case class Leaf(output: Seq[Attribute], table: String,
                          filters: Seq[Expression])

  /** Resolve a cached plan fragment to the base table it scans, seeing
    * through aliasing and attribute-only projections — the reference's
    * `CachedTablePattern` (`CachedTablePattern.scala:39-160`): a user who
    * `spark.catalog.cacheTable`s a dimension must not lose the star
    * rewrite, because cache substitution runs *before* the optimizer and
    * replaces the scan with an `InMemoryRelation`.
    */
  private def cachedTableOf(cube: RegisteredCube, plan: LogicalPlan)
      : Option[String] = plan match {
    case SubqueryAlias(_, child) => cachedTableOf(cube, child)
    case v: View => cachedTableOf(cube, v.child)
    case Project(projects, child) if projects.forall(_.isInstanceOf[Attribute]) =>
      cachedTableOf(cube, child)
    case lr: LogicalRelation => CubeCatalog.tableOf(cube, lr)
    case _ => None
  }

  /** Flatten a [Project/Filter]*-over-Join tree into leaves + a pool of all
    * predicates (join conditions and mid-tree filters). Returns None when
    * the subtree is not exclusively inner joins over known base tables.
    */
  private def collectTree(cube: RegisteredCube, plan: LogicalPlan)
      : Option[(Seq[Leaf], Seq[Expression])] = plan match {
    case PhysicalOperation(projects, filters, lr: LogicalRelation)
        if projects.forall(_.isInstanceOf[Attribute]) =>
      CubeCatalog.tableOf(cube, lr).map(t => (Seq(Leaf(lr.output, t, filters)), Nil))
    case PhysicalOperation(projects, filters,
        imr: org.apache.spark.sql.execution.columnar.InMemoryRelation)
        if projects.forall(_.isInstanceOf[Attribute]) =>
      cachedTableOf(cube, imr.cacheBuilder.logicalPlan)
        .map(t => (Seq(Leaf(imr.output, t, filters)), Nil))
    case PhysicalOperation(projects, filters, Join(l, r, Inner, cond, _))
        if projects.forall(_.isInstanceOf[Attribute]) =>
      for {
        (ll, lc) <- collectTree(cube, l)
        (rl, rc) <- collectTree(cube, r)
      } yield (ll ++ rl,
        lc ++ rc ++ cond.toSeq.flatMap(splitConjunctivePredicates) ++
          filters.flatMap(splitConjunctivePredicates))
    case _ => None
  }

  private def rewrite(child: LogicalPlan, required: AttributeSet,
                      groupingExprs: Option[Seq[Expression]],
                      aggFuncs: Seq[aggregate.AggregateExpression] = Nil)
      : Option[LogicalPlan] = {
    // a gate refusal anywhere in this subtree vetoes every enclosing match
    // (the Project case carries no grouping information, so without this a
    // refused aggregate would collapse through it ungated)
    if (child.exists(refused.contains)) return None
    // worth attempting for join subtrees AND bare fact-table scans (the
    // latter routes e.g. `Aggregate(Filter(lineitem))` onto the
    // time-bucket-partitioned cube so interval queries partition-prune —
    // the reference's relation IS the index, so it gets this for free)
    val candidate = child.exists {
      case _: Join => true
      case lr: LogicalRelation =>
        CubeCatalog.all.exists(c =>
          CubeCatalog.tableOf(c, lr).contains(c.info.starSchema.factTable))
      case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        CubeCatalog.all.exists(c =>
          cachedTableOf(c, imr.cacheBuilder.logicalPlan)
            .contains(c.info.starSchema.factTable))
      case _ => false
    }
    if (!candidate) return None
    CubeCatalog.all.view
      .flatMap(c => rewriteForCube(c, child, required, groupingExprs, aggFuncs))
      .headOption
  }

  private def rewriteForCube(cube: RegisteredCube, child: LogicalPlan,
                             required: AttributeSet,
                             groupingExprs: Option[Seq[Expression]],
                             aggFuncs: Seq[aggregate.AggregateExpression]): Option[LogicalPlan] = {
    val (leaves, conjuncts) = collectTree(cube, child).getOrElse(return None)
    // EVERY aggregate over a bare fact-table scan routes to the cube (the
    // reference's relation IS the Druid index, so every fact query runs
    // against it, `DruidRelation.scala:94-126`). FRESHNESS CONTRACT: like
    // every cube/rollup route (including the long-standing time-filtered
    // bare-fact path), the served data is as fresh as the last
    // materialize/CubeRefresh — exactly the reference's model, where
    // queries read the index, not the source extract. A session that must
    // see un-refreshed source rows disables the route
    // (`spark.graft.starJoin.enabled=false` / `Graft.withoutRewrites`).
    // Under that contract the cube scan is
    // row/column-equivalent to the raw one under column pruning, and
    // strictly better-laid-out — time-bucket partition dirs (interval
    // pruning + many-way scan parallelism where a raw fact extract may be
    // a handful of files) with dimension-clustered row groups inside each
    // bucket. When the grouping also fits a lattice node, the next
    // fixed-point iteration serves the aggregate from the rollup
    // (RollupRouting). Non-aggregate select-detail routes only under a
    // time predicate (where pruning pays): the Project case also matches
    // the fact leaf INSIDE a refused join tree during descent, and an
    // unconditional swap there would trade a dim-joined raw scan for a
    // wider one with no benefit signal.
    val factRole = cube.info.starSchema.factTable
    val singleFactRole = leaves.size == 1 &&
      cube.info.roleOfTable.get(leaves.head.table).exists(_.contains(factRole))
    lazy val hasTimeFilter = leaves.head.filters.exists(
      _.references.exists(_.name.equalsIgnoreCase(cube.info.timeColumn)))
    // Benefit signal for the bare-fact aggregate route. Without a time
    // filter (interval pruning) the cube extract is only a win when a
    // lattice node can later serve the aggregate (RollupRouting): the
    // extract's many time-bucket leaf files are strictly worse than the
    // raw fact table's layout for a full scan. Necessary condition mirrors
    // RollupRouting's own checks per aggregate FUNCTION — column coverage
    // alone routed q_percentile's EXACT percentile over metric columns to
    // the wide cube with zero rollup benefit (+36% at sf0.1). Pure-metric
    // sweeps (per-column exact-distinct profiling, exact percentiles over
    // un-sketched columns) therefore stay on the raw, narrower scan.
    lazy val rollupMayServe = groupingExprs.exists { gs =>
      val groupNames = gs.flatMap(_.references.toSeq).map(_.name.toLowerCase).toSet
      cube.rollups.exists { ru =>
        val dimsL = ru.dims.map(_.toLowerCase).toSet ++
          ru.timeColumn.map(_.toLowerCase) +
          ru.timeBucketColumn.toLowerCase + cube.info.timeColumn.toLowerCase
        val sumsL = ru.sums.keys.map(_.toLowerCase).toSet
        def refs(e: Expression): Set[String] =
          e.references.map(_.name.toLowerCase).toSet
        def fnServable(ae: aggregate.AggregateExpression): Boolean =
          if (ae.isDistinct)
            // count(DISTINCT dim) serves from surviving dim combinations
            // or the KMV sketch (exact-below-k proof checked at serve)
            refs(ae).subsetOf(dimsL ++ ru.kmvSketches.keys.map(_.toLowerCase))
          else ae.aggregateFunction match {
            case aggregate.Count(_) => true
            case s: aggregate.Sum => refs(s).subsetOf(dimsL ++ sumsL)
            case a: aggregate.Average => refs(a).subsetOf(sumsL)
            case m: aggregate.Min =>
              refs(m).subsetOf(dimsL ++ ru.mins.keys.map(_.toLowerCase))
            case m: aggregate.Max =>
              refs(m).subsetOf(dimsL ++ ru.maxs.keys.map(_.toLowerCase))
            case h: aggregate.HyperLogLogPlusPlus =>
              refs(h).subsetOf(dimsL ++ ru.hllSketches.keys.map(_.toLowerCase))
            case p: aggregate.Percentile =>
              !p.reverse && ru.totalRows.exists(_ <= ru.quantileK) &&
                refs(p.child).subsetOf(
                  ru.quantileSketches.keys.map(_.toLowerCase).toSet)
            case _ => false
          }
        groupNames.subsetOf(dimsL) &&
          aggFuncs.nonEmpty && aggFuncs.forall(fnServable)
      }
    }
    // Second benefit signal: scan-layout parallelism for COMPUTE-bound
    // aggregates. A raw fact extract written as few row groups scans as
    // few partitions; a non-codegen aggregate (TypedImperativeAggregate —
    // percentile, collect, mode: per-row object updates outside
    // whole-stage codegen) then bottlenecks on those cores, and the cube's
    // many time-bucket files win on parallelism alone even when no rollup
    // serves (measured: exact-percentile 1.5s raw single-split vs 1.2s
    // cube at sf0.1). Codegen'd aggregates are scan-bound — for them the
    // narrow raw file beats the wide extract's per-file overhead (the
    // q_profile regression that motivated the rollup gate), so they do
    // NOT take this path. At production scale raw tables out-split the
    // executors and the signal goes inert.
    lazy val computeBoundUnderSplit = {
      val computeBound = aggFuncs.exists { ae =>
        ae.aggregateFunction.isInstanceOf[aggregate.TypedImperativeAggregate[_]] ||
          // wide-decimal aggregation (the engine's own DECIMAL(28,6) exact
          // -sum idiom): precision beyond Decimal.MAX_LONG_DIGITS leaves
          // the compact-long representation — per-row BigDecimal objects,
          // ~10x long arithmetic even inside codegen
          (ae.aggregateFunction.dataType match {
            case d: org.apache.spark.sql.types.DecimalType =>
              d.precision > org.apache.spark.sql.types.Decimal.MAX_LONG_DIGITS
            case _ => false
          })
      }
      def underSplit = child.collectFirst {
        case lr: LogicalRelation => lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.inputFiles.length
          case _ => Int.MaxValue
        }
      }.exists(_ * 2 <= spark.sparkContext.defaultParallelism)
      computeBound && underSplit
    }
    val singleFactLeaf = singleFactRole &&
      (hasTimeFilter || rollupMayServe || computeBoundUnderSplit)
    if (leaves.size < 2 && !singleFactLeaf) return None

    val byExprId: Map[ExprId, Int] = (for {
      (l, i) <- leaves.zipWithIndex
      a <- l.output
    } yield a.exprId -> i).toMap
    def ownerOf(e: Expression): Option[Int] = {
      val owners = e.references.toSeq.flatMap(a => byExprId.get(a.exprId)).distinct
      if (owners.size == 1) Some(owners.head) else None
    }

    // Split the predicate pool into cross-leaf equality edges and residuals.
    val (equalities, residuals) = conjuncts.partition {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        (byExprId.get(a.exprId), byExprId.get(b.exprId)) match {
          case (Some(i), Some(j)) => i != j
          case _                  => return None // predicate over unknown attrs
        }
      case e if e.references.forall(a => byExprId.contains(a.exprId)) => false
      case _ => return None
    }

    // Group equality edges by unordered leaf pair.
    case class Edge(i: Int, j: Int, keys: Seq[(String, String)],
                    exprs: Seq[Expression])
    val edges = equalities.map {
      case eq @ EqualTo(a: AttributeReference, b: AttributeReference) =>
        val (ia, ib) = (byExprId(a.exprId), byExprId(b.exprId))
        if (ia < ib) (ia, ib, (a.name, b.name), eq: Expression)
        else (ib, ia, (b.name, a.name), eq: Expression)
    }.groupBy(t => (t._1, t._2)).map { case ((i, j), es) =>
      Edge(i, j, es.map(_._3), es.map(_._4))
    }.toSeq

    // Assign a star-schema role to every leaf (backtracking; role-playing
    // dimensions like nation-as-customer-nation are disambiguated by which
    // declared edges their join keys match).
    val schema = cube.info.starSchema
    val candidates: Seq[Seq[String]] =
      leaves.map(l => cube.info.roleOfTable.getOrElse(l.table, Nil))
    if (candidates.exists(_.isEmpty)) return None

    def solve(i: Int, assigned: Map[Int, String]): Option[Map[Int, String]] = {
      if (i == leaves.size) {
        // every edge must either match a declared star relation or be fully
        // mappable as a residual; star edges must connect all leaves.
        val starEdges = edges.filter { e =>
          schema.starEdge(assigned(e.i), assigned(e.j), e.keys.toSet).isDefined
        }
        // connectivity over star edges only
        val adj = starEdges.flatMap(e => Seq(e.i -> e.j, e.j -> e.i))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
        val factIdx = assigned.collectFirst {
          case (idx, role) if role == schema.factTable => idx
        }.getOrElse(return None)
        var seen = Set(factIdx)
        var frontier = List(factIdx)
        while (frontier.nonEmpty) {
          val nxt = frontier.flatMap(n => adj.getOrElse(n, Nil)).filterNot(seen)
          seen ++= nxt
          frontier = nxt
        }
        if (seen.size == leaves.size) Some(assigned) else None
      } else {
        candidates(i).filterNot(assigned.values.toSet)
          .view.flatMap(r => solve(i + 1, assigned + (i -> r))).headOption
      }
    }
    val assigned = solve(0, Map.empty).getOrElse(return None)

    val starEdges = edges.filter { e =>
      schema.starEdge(assigned(e.i), assigned(e.j), e.keys.toSet).isDefined
    }
    val residualEdgeExprs = edges.diff(starEdges).flatMap(_.exprs)
    val starKeyAttrs = AttributeSet(starEdges.flatMap(_.exprs).flatMap(_.references))

    // Map every needed source attribute to a cube column.
    val cubePlan = CubeCatalog.cubePlan(spark, cube)
    val cubeAttrByName: Map[String, Attribute] =
      cubePlan.output.map(a => a.name.toLowerCase -> a).toMap
    def cubeAttrFor(a: Attribute): Option[Attribute] = for {
      i <- byExprId.get(a.exprId)
      cubeCol <- cube.info.mapped(assigned(i), a.name)
      attr <- cubeAttrByName.get(cubeCol.toLowerCase)
    } yield attr

    // Leaf filters, minus IsNotNull on collapsed star-join keys (Noop trick).
    val leafFilters = leaves.flatMap(_.filters).filterNot {
      case IsNotNull(a: Attribute) => starKeyAttrs.contains(a)
      case _                       => false
    }
    val allFilters = leafFilters ++ residuals ++ residualEdgeExprs

    val neededAttrs = required ++ AttributeSet(allFilters.flatMap(_.references))
    val substitution: Map[ExprId, Attribute] = neededAttrs.toSeq.map { a =>
      a.exprId -> cubeAttrFor(a).getOrElse(return None)
    }.toMap

    // Cardinality gate (reference `maxResultCardinality`,
    // `DefaultSource.scala:212-213` + `FunctionalDependency.scala:59-84`):
    // refuse the rewrite when the estimated grouped-result cardinality
    // explodes. Estimated from the cube's NDV stats with functional
    // dependencies collapsing determined columns; a grouping expression is
    // bounded by the NDV product of the columns it references.
    // Time-granularity NDV model (reference `DruidQueryGranularity.ndv`,
    // `DruidQueryGranularity.scala:31-107`): grouping on `year(time)` has
    // ~years-of-data distinct values, not NDV(time) — without this, any
    // per-year grouping looks like a per-day explosion and the gate refuses
    // plans it should accept (the Q7 benchmark shape).
    def granularityNdv(e: Expression): Option[Long] = {
      def isTime(x: Expression): Boolean = x match {
        case a: Attribute =>
          substitution.get(a.exprId).exists(_.name.equalsIgnoreCase(cube.info.timeColumn))
        case Cast(u, _, _, _) => isTime(u)
        case _ => false
      }
      lazy val (days, months) = cube.info.timeIntervalMicros match {
        case Some((lo, hi)) =>
          val d = (hi - lo) / 86400000000L + 2
          (d, d / 30 + 2)
        case None => (36500L, 1200L)
      }
      e match {
        case Cast(u, _, _, _)            => granularityNdv(u)
        case Year(t) if isTime(t)        => Some(months / 12 + 2)
        case Quarter(t) if isTime(t)     => Some(4L)
        case Month(t) if isTime(t)       => Some(12L)
        case DayOfMonth(t) if isTime(t)  => Some(31L)
        case DayOfYear(t) if isTime(t)   => Some(366L)
        case TruncTimestamp(Literal(f, _), t, _) if isTime(t) =>
          granCount(String.valueOf(f), days, months)
        case TruncDate(t, Literal(f, _)) if isTime(t) =>
          granCount(String.valueOf(f), days, months)
        case _ => None
      }
    }

    for (gs <- groupingExprs) {
      val (timeGrouped, plain) = gs.partition(e => granularityNdv(e).isDefined)
      val granProduct: Long = timeGrouped
        .flatMap(granularityNdv).foldLeft(1L)((a, b) => math.min(a * b, Long.MaxValue / 4))
      val groupCols = plain.flatMap(_.references.toSeq)
        .flatMap(a => substitution.get(a.exprId)).map(_.name).distinct
      val stats = cube.info.columns
        .collect { case c if c.cardinality.isDefined => c.name -> c.cardinality.get }
        .toMap
      if (groupCols.forall(stats.contains) && (groupCols.nonEmpty || timeGrouped.nonEmpty)) {
        val est = granProduct * (
          if (groupCols.isEmpty) 1L
          else graft.cube.FunctionalDependencies.estimateCardinality(
            groupCols, stats, cube.info.functionalDeps))
        val maxCard = spark.conf.getOption("spark.graft.maxResultCardinality")
          .map(_.toLong).getOrElse(cube.info.maxResultCardinality)
        if (est > maxCard) {
          // reference semantics: the whole query stays in Spark — also veto
          // nested Project-level collapses of this join subtree
          child.foreach(refused.add)
          return None
        }
      }
    }

    def substitute(e: Expression): Expression = e.transformUp {
      case a: Attribute if substitution.contains(a.exprId) => substitution(a.exprId)
    }

    val filtered: LogicalPlan =
      if (allFilters.isEmpty) cubePlan
      else Filter(allFilters.map(substitute).reduce(And), cubePlan)

    val projections: Seq[NamedExpression] = required.toSeq.map { a =>
      Alias(substitution(a.exprId), a.name)(exprId = a.exprId)
    }
    Some(Project(projections, filtered))
  }
}

object StarJoinElimination {
  /** Distinct-bucket count of a `date_trunc` unit over the data interval. */
  private def granCount(fmt: String, days: Long, months: Long): Option[Long] =
    fmt.toLowerCase match {
      case "day" | "dd"           => Some(days)
      case "week"                 => Some(days / 7 + 2)
      case "month" | "mon" | "mm" => Some(months)
      case "quarter"              => Some(months / 3 + 2)
      case "year" | "yyyy" | "yy" => Some(months / 12 + 2)
      case _                      => None
    }

}
