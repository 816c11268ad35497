package graft.cube

/** Metadata model for a registered OLAP cube: column roles, functional
  * dependencies and the star-schema graph.
  *
  * Re-expresses the semantics of the reference's metadata layer
  * (`/root/reference/src/main/scala/org/sparklinedata/druid/metadata/
  * DruidDataSource.scala:42-92`, `StarSchemaInfo.scala:34-137`,
  * `FunctionalDependency.scala:22-84`) without any Druid coupling: a cube is
  * a denormalized, time-partitioned Parquet table plus this metadata.
  */
sealed trait ColumnRole
object ColumnRole {
  /** The mandatory time dimension (reference `DruidTimeDimension`). */
  case object Time extends ColumnRole
  /** Grouping/filtering column (reference `DruidDimension`). */
  case object Dimension extends ColumnRole
  /** Aggregatable measure (reference `DruidMetric`). */
  case object Metric extends ColumnRole
}

final case class CubeColumn(
    name: String,
    role: ColumnRole,
    cardinality: Option[Long] = None)

sealed trait RelType
object RelType {
  case object OneToOne extends RelType
  case object ManyToOne extends RelType
}

/** `from` determines `to` (reference `FunctionalDependency.scala:22-29`):
  * grouping by `from` makes `to` add no cardinality.
  */
final case class FunctionalDependency(from: String, to: String, relType: RelType)

object FunctionalDependencies {

  /** Estimate the result cardinality of grouping by `cols`, given per-column
    * distinct counts and declared dependencies (reference semantics:
    * `FunctionalDependency.estimateCardinality`,
    * `metadata/FunctionalDependency.scala:59-84`). Columns functionally
    * determined by another retained grouping column contribute nothing; the
    * rest multiply. 1-1 dependencies determine in both directions.
    */
  def estimateCardinality(
      cols: Seq[String],
      cardinality: Map[String, Long],
      deps: Seq[FunctionalDependency]): Long = {
    val determines: Map[String, Set[String]] = {
      val pairs = deps.flatMap {
        case FunctionalDependency(f, t, RelType.OneToOne)  => Seq(f -> t, t -> f)
        case FunctionalDependency(f, t, RelType.ManyToOne) => Seq(f -> t)
      }
      pairs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    }
    // transitive closure of "determined by a retained column"
    def determinedBy(a: String, b: String): Boolean = {
      var frontier = determines.getOrElse(a, Set.empty)
      var seen = frontier
      while (!frontier.contains(b) && frontier.nonEmpty) {
        frontier = frontier.flatMap(x => determines.getOrElse(x, Set.empty)) -- seen
        seen ++= frontier
      }
      seen.contains(b)
    }
    val distinct = cols.distinct
    val retained = distinct.filterNot { c =>
      // drop c if some other column (kept, earlier in order to break 1-1 ties)
      distinct.exists(o => o != c && determinedBy(o, c) &&
        !(determinedBy(c, o) && distinct.indexOf(c) < distinct.indexOf(o)))
    }
    val prod = retained.foldLeft(BigInt(1)) { (acc, c) =>
      acc * BigInt(cardinality.getOrElse(c, 1000L))
    }
    if (prod > BigInt(Long.MaxValue)) Long.MaxValue else prod.toLong
  }
}

/** One equi-join key pair of a star relation (reference
  * `StarSchemaInfo.scala:88`). `leftCol` belongs to the "many"/child table,
  * `rightCol` to the "one"/parent table.
  */
final case class EqualityCondition(leftCol: String, rightCol: String)

/** A declared edge of the star schema: `leftTable` (closer to the fact
  * table) references `rightTable` (reference `StarRelationInfo`,
  * `StarSchemaInfo.scala:56-61`). Table names here are *role* names — a
  * physical table playing two roles (e.g. nation as customer-nation and as
  * supplier-nation) appears as two roles with different column mappings.
  */
final case class StarRelation(
    leftTable: String,
    rightTable: String,
    relType: RelType,
    joinCondition: Seq[EqualityCondition])

/** The star-schema graph (reference `StarSchemaInfo.scala:34-45` plus the
  * structural constraints documented at `:127-137` and enforced at
  * `:354-463`): only 1-1 / n-1 relations, and a unique join path from every
  * table to the fact table (i.e. the graph is a tree rooted at the fact).
  */
final case class StarSchema(factTable: String, relations: Seq[StarRelation]) {

  val tables: Set[String] =
    relations.flatMap(r => Seq(r.leftTable, r.rightTable)).toSet + factTable

  /** parent of each non-fact table in the tree (child -> parent edge is
    * rightTable -> leftTable).
    */
  lazy val parentOf: Map[String, String] =
    relations.map(r => r.rightTable -> r.leftTable).toMap

  /** Validate the tree structure; returns an error description or None.
    * Deviation from the reference: we do not require globally-unique column
    * names (reference `StarSchemaInfo.scala:380-388`) because plan matching
    * resolves columns by attribute identity plus role assignment, not by
    * bare name.
    */
  def validate(): Option[String] = {
    val asChild = relations.groupBy(_.rightTable)
    val dup = asChild.collect { case (t, rs) if rs.size > 1 => t }
    if (dup.nonEmpty)
      return Some(s"tables with more than one parent (non-unique join path): ${dup.mkString(",")}")
    if (asChild.contains(factTable))
      return Some(s"fact table $factTable may not be the child of a relation")
    // every table must reach the fact table without cycles
    for (t <- tables if t != factTable) {
      var cur = t
      var steps = 0
      while (cur != factTable && steps <= tables.size) {
        parentOf.get(cur) match {
          case Some(p) => cur = p; steps += 1
          case None    => return Some(s"table $t does not reach fact table $factTable")
        }
      }
      if (steps > tables.size) return Some(s"cycle detected reaching fact from $t")
    }
    None
  }

  /** Find the declared relation joining the two roles with exactly this key
    * set, in either orientation (reference `StarSchema.isStarJoin`,
    * `StarSchemaInfo.scala:215-275`).
    */
  def starEdge(tableA: String, tableB: String,
               keys: Set[(String, String)]): Option[StarRelation] = {
    relations.find { r =>
      val declared = r.joinCondition.map(c => (c.leftCol, c.rightCol)).toSet
      (r.leftTable == tableA && r.rightTable == tableB && declared == keys) ||
      (r.leftTable == tableB && r.rightTable == tableA &&
        declared == keys.map(_.swap))
    }
  }
}

/** Full cube descriptor.
  *
  * @param name            cube name (also its table identifier)
  * @param timeColumn      cube column holding the time dimension
  * @param columns         cube column roles/stats
  * @param starSchema      the declared base-table graph this cube flattens
  * @param roleOfTable     physical source table name -> role names it plays
  * @param columnMapping   (role, source column) -> cube column; source
  *                        columns that did not survive denormalization are
  *                        simply absent (reference `columnMapping` option,
  *                        `DefaultSource.scala:197-308`)
  * @param functionalDeps  dimension dependencies for cardinality estimation
  * @param timeBucketColumn partition column of the materialized cube
  *                        (months since epoch, UTC) driving partition pruning
  */
final case class CubeInfo(
    name: String,
    timeColumn: String,
    columns: Seq[CubeColumn],
    starSchema: StarSchema,
    roleOfTable: Map[String, Seq[String]],
    columnMapping: Map[(String, String), String],
    functionalDeps: Seq[FunctionalDependency] = Nil,
    maxResultCardinality: Long = 1000000L,
    timeBucketColumn: String = "g_tbucket",
    /** [min, max] epoch-micros actually covered by the materialized cube
      * (the reference's index intervals, `QueryIntervals.scala:40-132`) —
      * lets the rules drop time predicates the data cannot violate and
      * fold fully-disjoint queries to empty.
      */
    timeIntervalMicros: Option[(Long, Long)] = None,
    /** measured at cube build: true iff every time value is exactly
      * midnight UTC — what licenses serving ARBITRARY time predicates from
      * a day-grain rollup (Druid's queryGranularity=DAY semantics, but
      * gated by measurement instead of silent truncation)
      */
    timeDayQuantized: Boolean = false,
    /** DECLARED: date/timestamp cube columns whose lag against the time
      * dimension is physically bounded (e.g. TPC-H ships every line within
      * ~4 months of its order date). The bound itself is never trusted from
      * the declaration — it is MEASURED at cube build into
      * [[timeLagBounds]].
      */
    timeCorrelatedColumns: Seq[String] = Nil,
    /** MEASURED at cube build: column -> (min, max) of
      * `timeColumn - column` in epoch micros over all rows where both are
      * non-NULL. Lets [[graft.plans.TimeBucketPruning]] derive implied
      * time-bucket bounds from predicates on the correlated column — a
      * dimension-date slice then prunes partitions even though the cube is
      * partitioned by the time dimension (zone-map-style correlation
      * pruning; neither Druid nor stock Spark has this).
      */
    timeLagBounds: Map[String, (Long, Long)] = Map.empty,
    /** MEASURED at cube build: the time column has zero NULLs. Implied
      * time predicates are only sound under this proof (a row with NULL
      * time satisfies no derived bound but may satisfy the original
      * correlated-column predicate).
      */
    timeNullFree: Boolean = false,
    /** DECLARED layout: dimensions the build sorts rows by inside each
      * time-bucket partition (Druid's secondary sort at the cube level) —
      * parquet row-group min/max on a sorted column turns dim slices into
      * IO skips, the layout stand-in for per-dimension inverted indexes.
      * Recorded in metadata so [[CubeRefresh]] re-applies the clustering
      * when it rewrites dirty buckets (the dynamic-partition writer
      * otherwise re-sorts by the partition column alone and destroys it).
      */
    clusterDims: Seq[String] = Nil) {

  val columnByName: Map[String, CubeColumn] = columns.map(c => c.name -> c).toMap

  def mapped(role: String, sourceCol: String): Option[String] =
    columnMapping.get((role, sourceCol))
}
