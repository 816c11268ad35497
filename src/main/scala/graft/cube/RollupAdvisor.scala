package graft.cube

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}

/** Workload-driven rollup recommendation: given the SQL a cube actually
  * serves, propose the lattice nodes (dimension sets) worth materializing,
  * with estimated stored rows from the cube's NDV stats and functional
  * dependencies — the designer-side counterpart of the reference's cost
  * gate (`maxResultCardinality`, `FunctionalDependency.scala:59-84`), which
  * only *rejects* plans at query time; this tells the operator what to
  * build so queries stop needing the fact table at all.
  *
  * Analysis is static (analyzed plans only — nothing is executed):
  *   - every `Aggregate` contributes its grouping columns; grouping on the
  *     time dimension (or functions of it) is served by the bucket column
  *     and adds no dimension;
  *   - `Filter` columns must also be retained by the node (a rollup can
  *     only filter on dimensions it kept), so they join the set;
  *   - aggregates must be mergeable (`count/sum/min/max/avg`, plus
  *     `count(DISTINCT dim)` via a KMV sketch column, reported separately);
  *     a query using anything else — or any non-cube column — is unservable
  *     and excluded.
  *
  * Recommendations are the Pareto front over (queries served, estimated
  * rows): a node is dropped if another serves at least as many queries with
  * no more rows.
  */
object RollupAdvisor {

  final case class QueryNeed(
      sql: String,
      dims: Set[String],
      sketchCols: Set[String])

  final case class Recommendation(
      dims: Seq[String],
      sketchCols: Seq[String],
      estRowsPerBucket: Long,
      queriesServed: Int,
      served: Seq[String])

  /** Classify one query against the cube; None = not servable from any
    * rollup of this cube.
    */
  def analyzeQuery(spark: SparkSession, cube: RegisteredCube,
                   sql: String): Option[QueryNeed] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val plan: LogicalPlan =
      try classic.sql(sql).queryExecution.analyzed
      catch { case _: Exception => return None }
    analyzePlan(cube, plan, sql)
  }

  /** Classify an already-analyzed plan (the form [[graft.plans.QueryHistory]]
    * hands over at record time — no SQL text survives into the history).
    */
  def analyzePlan(cube: RegisteredCube, plan: LogicalPlan,
                  label: String): Option[QueryNeed] = {
    val info = cube.info
    val timeCol = info.timeColumn.toLowerCase
    val dimCols = info.columns.filter(_.role != ColumnRole.Metric)
      .map(_.name.toLowerCase).toSet - timeCol
    val metricCols = info.columns.filter(_.role == ColumnRole.Metric)
      .map(_.name.toLowerCase).toSet

    val aggs = plan.collect { case a: Aggregate => a }
    if (aggs.isEmpty) return None

    var dims = Set.empty[String]
    var sketches = Set.empty[String]

    // source-column name -> cube columns it maps to. A role-played source
    // column (e.g. nation's n_name -> c_nation AND s_nation) is ambiguous
    // in a purely static analysis — the advisor takes the conservative
    // superset: a node keeping every candidate serves the query whichever
    // role the join actually used, at the cost of extra rows (which the
    // estimate then reflects honestly).
    val srcToCube: Map[String, Seq[String]] = info.columnMapping.toSeq
      .groupBy(_._1._2.toLowerCase)
      .map { case (src, es) => src -> es.map(_._2.toLowerCase).distinct }

    def refNames(e: Expression): Seq[String] =
      e.references.toSeq.map(_.name.toLowerCase)

    def dimCandidates(n: String): Option[Seq[String]] =
      if (n == timeCol) Some(Nil)
      else if (dimCols.contains(n)) Some(Seq(n))
      else srcToCube.get(n)
        .map(_.filter(d => d != timeCol))
        .filter(ds => ds.nonEmpty && ds.forall(dimCols.contains))

    // a grouping/filter column set is servable if every referenced column
    // resolves to cube dimensions (bucket covers the time column)
    def addServable(e: Expression): Boolean = refNames(e).forall { n =>
      dimCandidates(n) match {
        case Some(ds) => dims ++= ds; true
        case None     => false
      }
    }

    def aggServable(ae: AggregateExpression): Boolean = ae.aggregateFunction match {
      case Count(Seq(l: Literal)) if l.value != null => true
      case Count(Seq(a: Attribute)) if ae.isDistinct =>
        dimCandidates(a.name.toLowerCase) match {
          case Some(ds) if ds.nonEmpty => sketches ++= ds; true
          case _                       => false
        }
      case Sum(c, _)      => refNames(c).forall(metricCols.contains)
      case Min(c)         => refNames(c).forall(metricCols.contains)
      case Max(c)         => refNames(c).forall(metricCols.contains)
      case Average(c, _)  => refNames(c).forall(metricCols.contains)
      case _              => false
    }

    val ok = aggs.forall { a =>
      a.groupingExpressions.forall(addServable) &&
        a.aggregateExpressions.forall { ne =>
          val aggExprs = ne.collect { case ae: AggregateExpression => ae }
          aggExprs.forall(aggServable) &&
            // non-aggregate parts of the projection behave like groupings
            (aggExprs.nonEmpty || addServable(ne))
        }
    } && plan.collect { case f: Filter => f }.forall(f => addServable(f.condition))

    if (ok) Some(QueryNeed(label, dims, sketches)) else None
  }

  /** Recommend lattice nodes for a workload. Candidates are each query's
    * own dimension set plus the workload union (the finest node); the
    * result is the Pareto front sorted by queries served.
    */
  def recommend(spark: SparkSession, cube: RegisteredCube,
                workload: Seq[String],
                maxRowsPerBucket: Long = 10000000L): Seq[Recommendation] =
    recommendFromNeeds(cube, workload.flatMap(analyzeQuery(spark, cube, _)),
      maxRowsPerBucket)

  /** The recommendation core over pre-classified needs — the entry point
    * for history-driven advice (`ADVISE GRAFT ROLLUP`), where queries were
    * classified at execution time and only their needs were retained.
    */
  def recommendFromNeeds(cube: RegisteredCube, needs: Seq[QueryNeed],
                         maxRowsPerBucket: Long = 10000000L): Seq[Recommendation] = {
    if (needs.isEmpty) return Nil
    val ndv: Map[String, Long] = cube.info.columns
      .flatMap(c => c.cardinality.map(c.name.toLowerCase -> _)).toMap
    val deps = cube.info.functionalDeps.map(d =>
      d.copy(from = d.from.toLowerCase, to = d.to.toLowerCase))

    val candidates: Seq[Set[String]] =
      (needs.map(_.dims) :+ needs.flatMap(_.dims).toSet).distinct

    val recs = candidates.flatMap { cand =>
      val est = FunctionalDependencies.estimateCardinality(
        cand.toSeq.sorted, ndv, deps)
      if (est > maxRowsPerBucket) None
      else {
        val served = needs.filter(_.dims.subsetOf(cand))
        Some(Recommendation(
          dims = cand.toSeq.sorted,
          sketchCols = served.flatMap(_.sketchCols).distinct.sorted,
          estRowsPerBucket = est,
          queriesServed = served.size,
          served = served.map(_.sql)))
      }
    }
    // Pareto front: drop nodes dominated on both (served, rows)
    recs.filterNot(r => recs.exists(o => o != r &&
        o.queriesServed >= r.queriesServed &&
        o.estRowsPerBucket <= r.estRowsPerBucket &&
        (o.queriesServed > r.queriesServed || o.estRowsPerBucket < r.estRowsPerBucket)))
      .sortBy(r => (-r.queriesServed, r.estRowsPerBucket, r.dims.mkString(",")))
  }
}
