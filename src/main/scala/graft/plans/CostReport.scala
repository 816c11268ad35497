package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.graft.ScanBytes

import graft.cube.{CubeCatalog, FunctionalDependencies}

/** The observable face of the engine's thin cost gate — `EXPLAIN GRAFT
  * COST <sql>`.
  *
  * The reference prices its two execution routes (one broker query vs N
  * parallel historical queries) with an explicit cost model over index
  * stats (`sources/druid/DruidQueryCostModel.scala:345-414`,
  * `estimateInput` `:660-689`, `estimateOutputCardinality` `:691-716`).
  * Our engine's routes are "rewritten plan" (cube / rollup-lattice scans)
  * vs "raw Spark" (star joins over base parquet), and the gate's
  * cardinality estimate is the same functional-dependency closure product
  * (`FunctionalDependencies.estimateCardinality`). This report makes both
  * halves inspectable:
  *
  *   - one row per parquet scan of EACH route's planned physical tree,
  *     with the selected file count and footer-measured rows/bytes after
  *     static partition pruning and column pruning — the numbers are read
  *     from the actual plan, not re-derived, so they cannot drift from
  *     what execution does;
  *   - summary rows: per-route totals, the rows ratio (the Druid-style
  *     rows-scanned speedup BASELINE.md is graded on), and the FD-closure
  *     result-cardinality estimate the rewrite gate compared against
  *     `maxResultCardinality`.
  *
  * Scans are priced BEFORE execution (the initial adaptive plan already
  * carries them); runtime bloom/dynamic pruning is not modeled, so scan
  * figures are the upper bound a cost gate should price.
  */
object CostReport {

  /** (section, route, source, files, est_rows, est_bytes) rows. */
  def rows(spark: SparkSession, sql: String): Seq[Row] = {
    val engineDf = spark.sql(sql)
    // pricing records are trusted only if stamped AFTER this snapshot —
    // i.e. recorded while THIS query planned — so a TopN/sketch route, a
    // positional walk, or a direct parquet read over the same node can
    // never inherit a previous query's pricing numbers
    val seqBefore = RollupRouting.pricingSeq
    val engine = ScanBytes.costs(engineDf)
    val raw = graft.Graft.withoutRewrites(spark) {
      ScanBytes.costs(spark.sql(sql))
    }
    def section(name: String, costs: Seq[ScanBytes.ScanCost]): Seq[Row] =
      costs.map { c =>
        Row(name, route(c.rootPaths), c.rootPaths.map(tail).mkString(","),
          c.files, c.rows, c.bytes)
      }
    val engineRows = engine.map(_.rows).sum
    val rawRows = raw.map(_.rows).sum
    val summary = Seq(
      Row("summary", "engine_total", "", engine.map(_.files).sum,
        engineRows, engine.map(_.bytes).sum),
      Row("summary", "raw_total", "", raw.map(_.files).sum,
        rawRows, raw.map(_.bytes).sum),
      // percent, not a bare quotient: the column is integral (est_rows is
      // long), and integer division would truncate a 1.9x speedup to 1 —
      // raw/engine*100 keeps two significant digits for small ratios
      Row("summary", "rows_ratio", "raw/engine_pct", null,
        if (engineRows > 0) rawRows * 100L / engineRows else null, null)) ++
      estimateRow(engineDf)
    section("engine", engine) ++ section("raw", raw) ++
      lattice(spark, engine, seqBefore) ++ summary
  }

  /** One row per lattice node (and the fact cube) of every cube the engine
    * route touched, with the price the router compared — the query's
    * POST-PRUNING files/rows/bytes per candidate when this query's
    * routing decision was recorded ([[RollupRouting.latestPricing]]; the
    * reference's interval-ratio input estimate,
    * `DruidQueryCostModel.scala:660-689`, made inspectable), falling back
    * to whole-node stored size
    * ([[org.apache.spark.sql.graft.ScanBytes.dirCost]]) for nodes the
    * router never priced (unservable for this query) or when no decision
    * matches the plan. "chosen" marks the node the plan actually scans;
    * "refused" a candidate pricing above the fact route's own pruned
    * scan; "unservable" a node that could not serve this query at all.
    */
  private def lattice(spark: SparkSession,
                      engine: Seq[ScanBytes.ScanCost],
                      seqBefore: Long): Seq[Row] = {
    val scanned = engine.flatMap(_.rootPaths).map(CubeCatalog.normalizePath).toSet
    // trust only decisions recorded while THIS query planned (seq stamp)
    // whose outcome matches the plan being reported on (chosen/declined
    // path is among the scans) — one record per routed aggregate, so a
    // multi-cube plan keeps every cube's own pricing table
    val pricings = RollupRouting.pricingsSince(seqBefore).filter(p =>
      p.chosenPath.map(CubeCatalog.normalizePath) match {
        case Some(cp) => scanned.contains(cp)
        case None => scanned.contains(CubeCatalog.normalizePath(p.fact.path))
      })
    CubeCatalog.all
      .filter(c => (CubeCatalog.normalizePath(c.cubePath) +:
        c.rollups.map(r => CubeCatalog.normalizePath(r.path)))
        .exists(scanned.contains))
      .flatMap { c =>
        // the 'unservable' marker only means anything relative to a
        // decision made FOR this cube — other cubes' nodes in the same
        // plan fall back to stored size, not a foreign verdict
        val cubeDecisions = pricings.filter(p =>
          CubeCatalog.normalizePath(p.fact.path) ==
            CubeCatalog.normalizePath(c.cubePath))
        // several aggregates over the SAME cube record one decision each
        // (newest first): merge newest-wins, then overlay any node an
        // OLDER decision chose that this plan actually scans — without
        // the overlay, a node chosen by aggregate 1 but refused by
        // aggregate 2 would read 'refused' while the plan scans it
        val priceOf: Map[String, RollupRouting.NodePrice] =
          cubeDecisions.reverse.foldLeft(
            Map.empty[String, RollupRouting.NodePrice]) { (m, p) =>
            m ++ (p.fact +: p.nodes)
              .map(n => CubeCatalog.normalizePath(n.path) -> n)
          } ++ cubeDecisions.reverse.flatMap(p => (p.fact +: p.nodes)
            .filter(n => n.verdict == "chosen" &&
              scanned.contains(CubeCatalog.normalizePath(n.path))))
            .map(n => CubeCatalog.normalizePath(n.path) -> n).toMap
        val pricing = cubeDecisions.headOption
        val nodes = (s"cube:${c.info.name}", c.cubePath) +:
          c.rollups.map(r => (s"rollup:${tail(r.path)}", r.path))
        nodes.map { case (label, p) =>
          val norm = CubeCatalog.normalizePath(p)
          priceOf.get(norm) match {
            case Some(n) =>
              Row("lattice", label, n.verdict, n.files, n.rows, n.bytes)
            case None =>
              val (files, rows, bytes) = ScanBytes.dirCost(spark, p, 64)
              val marker =
                if (scanned.contains(norm)) "chosen"
                else if (pricing.isDefined) "unservable"
                else "candidate"
              Row("lattice", label, marker, files, rows, bytes)
          }
        }
      }
  }

  /** FD-closure output-cardinality estimate for the query's top Aggregate,
    * resolved against the first registered cube that knows every grouping
    * column (the same lookup the rewrite gate performs).
    */
  private def estimateRow(df: org.apache.spark.sql.DataFrame): Seq[Row] = {
    val optimized = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan
    val groupNames = optimized.collectFirst { case a: Aggregate =>
      a.groupingExpressions.flatMap(_.references.toSeq).map(_.name).distinct
    }
    for {
      names <- groupNames.toSeq
      cube <- CubeCatalog.all.find(c =>
        names.forall(n => c.info.columnByName.contains(n))).toSeq
    } yield {
      val cards = cube.info.columns
        .flatMap(c => c.cardinality.map(c.name -> _)).toMap
      val est = FunctionalDependencies.estimateCardinality(
        names, cards, cube.info.functionalDeps)
      Row("summary", "result_estimate",
        s"group by ${names.mkString(",")} via ${cube.info.name}",
        null, est, null)
    }
  }

  private def tail(p: String): String =
    p.split('/').takeRight(1).mkString

  /** Classify a scan's root paths against the catalog: a materialized
    * cube, a rollup-lattice node, a registered base table, or other.
    */
  private def route(rootPaths: Seq[String]): String = {
    val norm = rootPaths.map(CubeCatalog.normalizePath)
    val cubes = CubeCatalog.all
    def hit(p: String): String =
      cubes.collectFirst {
        case c if CubeCatalog.normalizePath(c.cubePath) == p =>
          s"cube:${c.info.name}"
      }.orElse(cubes.flatMap(c => c.rollups.collectFirst {
        case r if CubeCatalog.normalizePath(r.path) == p =>
          s"rollup:${tail(r.path)}"
      }).headOption).orElse(cubes.flatMap(c =>
        c.tableForPath(p).map(t => s"raw:$t")).headOption)
        .getOrElse(s"other:${tail(p)}")
    norm.map(hit).distinct.mkString(",")
  }
}
