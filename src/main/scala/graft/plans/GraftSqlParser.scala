package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}

/** SQL command entry points, as a parser extension — the reference's
  * `SPLParser` (`hive/sparklinedata/SparklineDataParser.scala:42-124`)
  * re-expressed on `SparkSessionExtensions.injectParser`:
  *
  *   - `EXPLAIN GRAFT REWRITE <sql>`  — the cube-rewrite report
  *     (reference `ExplainDruidRewrite`)
  *   - `SHOW GRAFT CUBES`             — registered cubes + their lattices
  *     (reference metadata views)
  *   - `DESCRIBE GRAFT CUBE <name>`   — per-column roles/NDV/rollup merges
  *   - `CLEAR GRAFT CACHE`            — drop registrations + plan cache
  *   - `REGISTER GRAFT CUBE FROM '<path>'` — attach a materialized cube
  *     from its descriptor sidecar ([[graft.cube.CubeMeta]])
  *   - `REGISTER GRAFT ARTIFACT FROM '<path>'` — attach an existing
  *     pipeline artifact (IVF/span/pair store) from its durable kind
  *     metadata, so a fresh session's `graft_artifacts` / ADVISE loop
  *     covers stores built by earlier sessions
  *   - `MIGRATE GRAFT ARTIFACT FROM '<src>' TO '<dst>' [PROTOCOL <p>]` —
  *     faithful cross-protocol clone (POSIX ↔ manifest/object-store) of a
  *     pipeline artifact: distributed rewrite, layout preserved, pending
  *     tombstones carried, source untouched
  *   - `PIN GRAFT ARTIFACT '<path>'` / `UNPIN GRAFT ARTIFACT '<path>'
  *     ID '<pin_id>'` — durable manifest-snapshot pin for pure-SQL
  *     readers spanning maintenance cycles
  *   - `REFRESH GRAFT CUBE <name> [BUCKETS (b, ...)]` — incremental
  *     cube maintenance from the registered descriptor alone: dirty
  *     buckets detected (or pinned), generation-swap refresh, lattice +
  *     stats upkeep ([[graft.cube.CubeRefresh]])
  *   - `REGISTER GRAFT VIEWS`         — snapshot the catalog into the
  *     joinable `graft_cubes`/`graft_columns`/`graft_rollups`/
  *     `graft_query_history` views
  *   - `SHOW GRAFT HISTORY`           — the executed-query log
  *     (reference `metadata/DruidQueryHistory.scala`)
  *
  * Anything else delegates verbatim to Spark's own parser.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val ExplainRe =
    "(?is)\\s*EXPLAIN\\s+GRAFT\\s+REWRITE\\s+(.+)".r
  private val CostRe =
    "(?is)\\s*EXPLAIN\\s+GRAFT\\s+COST\\s+(.+)".r
  private val ShowRe =
    "(?is)\\s*SHOW\\s+GRAFT\\s+CUBES\\s*;?\\s*".r
  private val DescRe =
    "(?is)\\s*DESCRIBE\\s+GRAFT\\s+CUBE\\s+([\\w.]+)\\s*;?\\s*".r
  private val ClearRe =
    "(?is)\\s*CLEAR\\s+GRAFT\\s+CACHE\\s*;?\\s*".r
  private val RegisterRe =
    "(?is)\\s*REGISTER\\s+GRAFT\\s+CUBE\\s+FROM\\s+'([^']+)'\\s*;?\\s*".r
  private val RegisterArtifactRe =
    "(?is)\\s*REGISTER\\s+GRAFT\\s+ARTIFACT\\s+FROM\\s+'([^']+)'\\s*;?\\s*".r
  private val MigrateArtifactRe =
    ("(?is)\\s*MIGRATE\\s+GRAFT\\s+ARTIFACT\\s+FROM\\s+'([^']+)'\\s+TO\\s+" +
      "'([^']+)'\\s*(?:PROTOCOL\\s+(\\w+)\\s*)?;?\\s*").r
  private val PinArtifactRe =
    "(?is)\\s*PIN\\s+GRAFT\\s+ARTIFACT\\s+'([^']+)'\\s*;?\\s*".r
  private val UnpinArtifactRe =
    "(?is)\\s*UNPIN\\s+GRAFT\\s+ARTIFACT\\s+'([^']+)'\\s+ID\\s+'([^']+)'\\s*;?\\s*".r
  private val MaterializeRe =
    ("(?is)\\s*MATERIALIZE\\s+GRAFT\\s+ROLLUP\\s+ON\\s+([\\w.]+)\\s+" +
      "DIMENSIONS\\s*\\(([^)]*)\\)\\s*(?:SKETCH\\s*\\(([^)]*)\\)\\s*)?" +
      "(?:PARTITION\\s+BY\\s*\\(([^)]*)\\)\\s*)?" +
      "(?:CLUSTER\\s+BY\\s*\\(([^)]*)\\)\\s*)?" +
      "AT\\s+'([^']+)'\\s*;?\\s*").r
  private val ExecuteRe =
    "(?is)\\s*ON\\s+GRAFT\\s+CUBE\\s+([\\w.]+)\\s+EXECUTE\\s+QUERY\\s+'([^']+)'\\s*;?\\s*".r
  private val StatsRe =
    "(?is)\\s*SHOW\\s+GRAFT\\s+STATS\\s*;?\\s*".r
  private val HistoryRe =
    "(?is)\\s*SHOW\\s+GRAFT\\s+HISTORY\\s*;?\\s*".r
  private val AdviseRe =
    "(?is)\\s*ADVISE\\s+GRAFT\\s+ROLLUP\\s+ON\\s+([\\w.]+)\\s*;?\\s*".r
  private val AdviseMaintRe =
    "(?is)\\s*ADVISE\\s+GRAFT\\s+MAINTENANCE\\s*;?\\s*".r
  private val ViewsRe =
    "(?is)\\s*REGISTER\\s+GRAFT\\s+VIEWS\\s*;?\\s*".r
  private val RefreshCubeRe =
    ("(?is)\\s*REFRESH\\s+GRAFT\\s+CUBE\\s+([\\w.]+)\\s*" +
      "(?:BUCKETS\\s*\\(([^)]*)\\)\\s*)?;?\\s*").r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case ExplainRe(inner) => ExplainGraftRewriteCommand(inner.trim.stripSuffix(";"))
    case CostRe(inner)    => ExplainGraftCostCommand(inner.trim.stripSuffix(";"))
    case ShowRe()         => ShowGraftCubesCommand()
    case DescRe(name)     => DescribeGraftCubeCommand(name)
    case ClearRe()        => ClearGraftCacheCommand()
    case StatsRe()        => ShowGraftStatsCommand()
    case HistoryRe()      => ShowGraftHistoryCommand()
    case AdviseRe(cube)   => AdviseGraftRollupCommand(cube)
    case AdviseMaintRe()  => AdviseGraftMaintenanceCommand()
    case ViewsRe()        => RegisterGraftViewsCommand()
    case RegisterRe(path) => RegisterGraftCubeCommand(path)
    case RefreshCubeRe(name, buckets) =>
      // a non-integer bucket token must fail as a PARSE error naming the
      // statement and the offending token, not escape as a raw
      // NumberFormatException with no context (r19 ADVICE)
      RefreshGraftCubeCommand(name,
        Option(buckets).map(_.split(",").map(_.trim).filter(_.nonEmpty)
          .map(tok =>
            try tok.toInt
            catch {
              case _: NumberFormatException =>
                throw new IllegalArgumentException(
                  s"REFRESH GRAFT CUBE $name: BUCKETS expects an " +
                    s"integer list, got '$tok' — e.g. BUCKETS (312, 313)")
            }).toSeq))
    case RegisterArtifactRe(path) => RegisterGraftArtifactCommand(path)
    case MigrateArtifactRe(src, dst, proto) =>
      MigrateGraftArtifactCommand(src, dst,
        Option(proto).map(_.toLowerCase(java.util.Locale.ROOT)))
    case PinArtifactRe(path)        => PinGraftArtifactCommand(path)
    case UnpinArtifactRe(path, id)  => UnpinGraftArtifactCommand(path, id)
    case MaterializeRe(cube, dims, sketches, partDims, clusDims, path) =>
      def split(s: String): Seq[String] =
        Option(s).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      MaterializeGraftRollupCommand(cube, split(dims), split(sketches),
        split(partDims), split(clusDims), path)
    // raw query-spec execution (reference `ON DRUIDDATASOURCE ds EXECUTE
    // QUERY <json>`, `SparklineDataParser.scala:113-119`): the descriptor
    // builds a DataFrame plan directly — dynamic schema, and still subject
    // to the lattice/pruning rewrites
    case ExecuteRe(cube, json) =>
      graft.cube.DirectQuery.execute(
        org.apache.spark.sql.SparkSession.active, cube, json)
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.logical
    case _                => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

case class ExplainGraftRewriteCommand(sql: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("plan", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.Graft.explainRewrite(spark, sql).linesIterator.map(Row(_)).toSeq
}

/** `EXPLAIN GRAFT COST <sql>` — planned-scan pricing of the rewritten vs
  * raw route plus the FD-closure cardinality estimate (the reference's
  * `DruidQueryCostModel` surface; see [[CostReport]]).
  */
case class ExplainGraftCostCommand(sql: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("section", StringType, nullable = false)(),
    AttributeReference("route", StringType, nullable = false)(),
    AttributeReference("source", StringType, nullable = false)(),
    AttributeReference("files", LongType, nullable = true)(),
    AttributeReference("est_rows", LongType, nullable = true)(),
    AttributeReference("est_bytes", LongType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] = CostReport.rows(spark, sql)
}

case class ShowGraftCubesCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("cube", StringType, nullable = false)(),
    AttributeReference("fact_table", StringType, nullable = false)(),
    AttributeReference("time_column", StringType, nullable = false)(),
    AttributeReference("cube_path", StringType, nullable = false)(),
    AttributeReference("rollups", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.cube.CubeCatalog.all.sortBy(_.info.name).map { c =>
      Row(c.info.name, c.info.starSchema.factTable, c.info.timeColumn,
        c.cubePath,
        c.rollups.map(r => s"${r.dims.mkString("+")}@${r.path}").mkString("; "))
    }
}

/** `REGISTER GRAFT VIEWS` — (re)snapshot the catalog into the queryable
  * `graft_cubes` / `graft_columns` / `graft_rollups` temp views (the
  * reference's metadata views, `metadata/DruidMetadataViews.scala`).
  */
case class RegisterGraftViewsCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("view", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    graft.Graft.registerMetadataViews(spark)
    Seq("graft_cubes", "graft_columns", "graft_rollups",
      "graft_query_history").map(Row(_))
  }
}

/** The reference's `CLEAR DRUID CACHE` — drops cube registrations and
  * cached scan plans; materialized parquet survives and re-registers on the
  * next `ensure`.
  */
case class ClearGraftCacheCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("cleared", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val names = graft.cube.CubeCatalog.all.map(_.info.name).sorted
    graft.cube.CubeCatalog.clear()
    RewriteStats.reset()
    names.map(Row(_))
  }
}

/** `SHOW GRAFT STATS` — how often each rewrite rule fired this session
  * (reference: per-query Druid execution metrics + UI tab, SURVEY.md §4.4).
  * The signal an operator actually needs: a workload whose counters stay
  * at zero is running on raw fact scans and needs cube/rollup coverage.
  */
case class ShowGraftStatsCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("rule", StringType, nullable = false)(),
    AttributeReference("fires", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    RewriteStats.snapshot.map { case (r, n) => Row(r, n.toString) }
}

/** `SHOW GRAFT HISTORY` — the executed-query log: what each completed
  * action was served by (rollup node / cube extract / raw scans) and how
  * long it ran (reference `metadata/DruidQueryHistory.scala`; the joinable
  * snapshot twin is the `graft_query_history` view).
  */
/** `ADVISE GRAFT ROLLUP ON <cube>` — workload-driven lattice advice from
  * the session's recorded query history: every executed query was
  * classified against the registered cubes at record time
  * ([[QueryHistory]]), so the advisor runs over what the session actually
  * ran, with no SQL retained. Each recommendation row carries the
  * ready-to-run `MATERIALIZE GRAFT ROLLUP` statement, closing the loop
  * history → advice → build.
  */
case class AdviseGraftRollupCommand(cube: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("dimensions", StringType, nullable = false)(),
    AttributeReference("sketch_cols", StringType, nullable = false)(),
    AttributeReference("est_rows_per_bucket", StringType, nullable = false)(),
    AttributeReference("queries_served", StringType, nullable = false)(),
    AttributeReference("materialize_sql", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val c = graft.cube.CubeCatalog.get(cube).getOrElse(
      throw new IllegalArgumentException(s"no registered cube named $cube"))
    val needs = QueryHistory.snapshot.flatMap(_.needs.collect {
      case (n, dims, sk) if n == c.info.name =>
        graft.cube.RollupAdvisor.QueryNeed("<history>", dims, sk)
    })
    graft.cube.RollupAdvisor.recommendFromNeeds(c, needs).map { r =>
      val sketch = if (r.sketchCols.isEmpty) ""
        else s" SKETCH (${r.sketchCols.mkString(", ")})"
      val ddl = s"MATERIALIZE GRAFT ROLLUP ON ${c.info.name} " +
        s"DIMENSIONS (${r.dims.mkString(", ")})$sketch " +
        s"AT '<rollup-path>'"
      Row(r.dims.mkString(","), r.sketchCols.mkString(","),
        r.estRowsPerBucket.toString, r.queriesServed.toString, ddl)
    }
  }
}

/** `ADVISE GRAFT MAINTENANCE` — the pipeline-artifact twin of
  * `ADVISE GRAFT ROLLUP` (r15 verdict item 3): one row per registered
  * IVF store (maintenance pressure = pending tombstone rows vs the
  * serve cap, plus append files per bucket) and per span-count store
  * (pressure = accumulated partial files, which every serve re-merges)
  * with, past a threshold, a ready-to-run compaction recommendation —
  * so an operator folds BEFORE the tombstone cap's `require` throws or
  * the store becomes a small-file swamp, instead of learning from the
  * failure. Thresholds: `spark.graft.ivf.adviseTombstonePct` (default
  * 0.5 — advise once the sidecar passes half of
  * `spark.graft.ivf.maxPendingTombstones`),
  * `spark.graft.ivf.adviseFilesPerBucket` (default 4 — a probe of
  * nprobe buckets then opens 4×nprobe files where a compacted store
  * opens nprobe), and `spark.graft.span.adviseFiles` (default 128 —
  * roughly three shuffle-partition-sized appends on top of a compacted
  * store). `files_pressure` is max-files-per-bucket for IVF, total
  * data files for span stores. The third IVF leg is DRIFT: ingest
  * through frozen centroids piles new mass into few buckets, and once
  * the hottest bucket holds `spark.graft.ivf.adviseHotBucketShare`
  * (default 0.5) of the rows AND at least 3× its balanced share —
  * clamped to 0.9 so a k≤3 store (whose raw 3/k floor would be ≥ 1.0,
  * unreachable) still gets drift advice at a 90% hot bucket while
  * small-k stores' legitimate shares don't false-alarm; a store with a
  * single PHYSICAL bucket directory is exempt (hotShare = 1.0 is
  * definitional there, not drift, and the advice could never clear) —
  * the advice is
  * `ivfRecluster` — compaction fixes file counts, only a retrain fixes
  * read volume (`hot_bucket_share` column; −1 = not an IVF store or an
  * empty one; beyond the snapshot's footer cap the share estimates
  * from file bytes in the listing, so many-file stores keep a drift
  * signal; while tombstone pressure also fires the retrain is NOT
  * recommended — the share counts physical rows, and the fold may be
  * the whole rebalance). Reading the
  * pressure is driver-side listing + footer metadata only, like the
  * views — advice must never cost a Spark job.
  */
case class AdviseGraftMaintenanceCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("pending_tombstones", LongType, nullable = false)(),
    AttributeReference("tombstone_cap", LongType, nullable = false)(),
    AttributeReference("files_pressure", LongType, nullable = false)(),
    AttributeReference("hot_bucket_share", DoubleType, nullable = false)(),
    AttributeReference("advice", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val cap = spark.conf
      .get("spark.graft.ivf.maxPendingTombstones", "1048576").toLong
    val tombPct = spark.conf
      .get("spark.graft.ivf.adviseTombstonePct", "0.5").toDouble
    val filesAt = spark.conf
      .get("spark.graft.ivf.adviseFilesPerBucket", "4").toInt
    val spanFilesAt = spark.conf
      .get("spark.graft.span.adviseFiles", "128").toInt
    val hotShareAt = spark.conf
      .get("spark.graft.ivf.adviseHotBucketShare", "0.5").toDouble
    QueryHistory.artifactsSnapshot.collect {
      case ("ivf", path) =>
        val (pending, maxFiles, buckets, hotShare) =
          graft.operators.Similarity.maintenancePressure(spark, path)
        val tombstonePressure = pending >= (cap * tombPct).toLong && pending > 0
        val compactReasons = Seq(
          if (tombstonePressure)
            Some(s"$pending pending tombstones >= ${(tombPct * 100).toInt}% " +
              s"of cap $cap") else None,
          if (maxFiles >= filesAt)
            Some(s"$maxFiles append files in one bucket (threshold $filesAt)")
          else None).flatten
        // drift is judged on PHYSICAL rows, which still include pending
        // tombstones — while tombstone pressure fires, the fold may be
        // all the rebalance needed (e.g. a bulk-tombstoned clump), so
        // the expensive retrain is not recommended until the next ADVISE
        // re-judges the folded store (r16 review)
        // balanced-share floor clamped to 0.9: at small k the raw 3/k
        // floor reaches or passes 1.0 (k<=3), which would silently
        // disable the drift leg for stores where a 90% hot bucket is
        // still unambiguous drift (r16 ADVICE). buckets > 1: a
        // one-bucket store has hotShare = 1.0 by definition — no
        // imbalance signal exists, and recommending the retrain forever
        // would never clear (r17 review)
        val drifted = !tombstonePressure && hotShare >= hotShareAt &&
          buckets > 1 && hotShare >= math.min(0.9, 3.0 / buckets)
        val advice = Seq(
          if (compactReasons.isEmpty) None
          else Some("run graft.operators.Similarity.ivfCompact(spark, \"" +
            path + "\") — " + compactReasons.mkString("; ") +
            (if (tombstonePressure && hotShare >= hotShareAt)
              "; re-run ADVISE after the fold — the hot-bucket share " +
                "includes the tombstoned rows" else "")),
          if (!drifted) None
          else Some("run graft.operators.Similarity.ivfRecluster (retrain " +
            s"+ re-partition) — hottest of $buckets buckets holds " +
            f"${hotShare * 100}%.0f%% of rows (threshold " +
            f"${hotShareAt * 100}%.0f%%): probes of it scan that share " +
            "of the store; compaction cannot fix read volume")
        ).flatten.mkString(" | ")
        Row("ivf", path, pending, cap, maxFiles.toLong, hotShare, advice)
      case ("span_store", path) =>
        // through the seam: a manifest span store's partials live inside
        // segment dirs — a top-level-only count would read 0 forever and
        // the compact advice would never fire (r17 review)
        val files = (try graft.operators.ArtifactStore
            .forPath(spark, path).snapshot(spark, path).dataPaths
          // NonFatal, not just vanished-store ISE: a URI-rooted store's
          // transient FS fault must degrade THIS row, never abort the
          // whole ADVISE statement (r18 review pass 1 — same contract
          // as the graft_artifacts view)
          catch { case scala.util.control.NonFatal(t) =>
            graft.operators.ArtifactStore.warnDegraded(path, t)
            Seq.empty[String]
          })
          .flatMap(graft.operators.ArtifactStore.parquetFilesUnder).size
        val advice =
          if (files < spanFilesAt) ""
          else "run graft.operators.Dedup.spanCountsCompact(spark, \"" +
            path + s"""") — $files partial files (threshold $spanFilesAt; """ +
            "every serve re-merges all of them)"
        Row("span_store", path, -1L, -1L, files.toLong, -1.0, advice)
    }.sortBy(r => (r.getString(0), r.getString(1)))
  }
}

case class ShowGraftHistoryCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("id", StringType, nullable = false)(),
    AttributeReference("action", StringType, nullable = false)(),
    AttributeReference("served", StringType, nullable = false)(),
    AttributeReference("duration_ms", StringType, nullable = false)(),
    AttributeReference("scan_files", StringType, nullable = false)(),
    AttributeReference("scan_rows", StringType, nullable = false)(),
    AttributeReference("scan_bytes", StringType, nullable = false)(),
    AttributeReference("plan_head", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    QueryHistory.snapshot.map { e =>
      Row(e.id.toString, e.action, e.served, e.durationMs.toString,
        e.scanFiles.toString, e.scanRows.toString, e.scanBytes.toString,
        e.planHead)
    }
}

/** Attach a previously materialized cube from its `_graft_cube.json`
  * descriptor sidecar — the durable-catalog counterpart of the reference's
  * per-session `CREATE TEMPORARY TABLE ... USING` datasource declaration.
  */
/** `REFRESH GRAFT CUBE <name> [BUCKETS (b, ...)]` — incremental cube
  * maintenance as a SQL verb, the operational twin of the reference's
  * external re-indexing loop (`HadoopDruidIndexer` rebuilds segments per
  * interval; here the engine owns the rebuild): the registered
  * descriptor carries the star schema and base-table paths, so the
  * flattening frame is rebuilt from metadata alone
  * ([[graft.sources.CubeSource.flatten]]) and
  * [[graft.cube.CubeRefresh]] runs the generation-swap refresh —
  * dirty-bucket detection against the CURRENT fact tables unless
  * BUCKETS pins the set. Returns the dirty set, rows written and the
  * published generation number.
  */
case class RefreshGraftCubeCommand(name: String, buckets: Option[Seq[Int]])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("cube", StringType, nullable = false)(),
    AttributeReference("dirty_buckets", StringType, nullable = false)(),
    AttributeReference("rows_written", StringType, nullable = false)(),
    AttributeReference("generation", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val cube = graft.cube.CubeCatalog.get(name).getOrElse(
      throw new IllegalArgumentException(
        s"no registered cube named $name — materialize it or " +
          "REGISTER GRAFT CUBE FROM its path first"))
    val flat = graft.sources.CubeSource.flatten(spark, cube.info,
      cube.tablePaths)
    val res = graft.cube.CubeRefresh.refresh(spark, cube, flat, buckets)
    Seq(Row(cube.info.name, res.dirtyBuckets.mkString(","),
      res.cubeRowsWritten.toString,
      graft.cube.CubeGenerations.genNumberOf(
        res.refreshed.cubePath).toString))
  }
}

case class RegisterGraftCubeCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("cube", StringType, nullable = false)(),
    AttributeReference("rollups", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val cube = graft.cube.CubeMeta.attach(spark, path)
    Seq(Row(cube.info.name, cube.rollups.size.toString))
  }
}

/** `REGISTER GRAFT ARTIFACT FROM '<path>'` — attach an existing pipeline
  * artifact (IVF store / span-count store / pair index) to this session's
  * registry from its own durable kind metadata (the POSIX
  * `.artifact.json` sidecar or the manifest's `kind` field), the
  * artifact twin of `REGISTER GRAFT CUBE FROM` (r16 verdict item 2: the
  * registry was session-local — a fresh monitoring session running
  * `ADVISE GRAFT MAINTENANCE` over existing on-disk stores saw an empty
  * `graft_artifacts`, so the advice loop only closed for the JVM that
  * built the artifacts). Driver-side file reads only — registration must
  * never cost a Spark job.
  */
case class RegisterGraftArtifactCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("path", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    // session-bound form: a store on a session-registered FS scheme
    // must register from ITS session's conf (r18 verdict item 4)
    val kind = graft.operators.ArtifactStore.kindOf(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"no artifact kind metadata at $path — stores record their kind " +
          "when built or appended through the engine (POSIX: an " +
          ".artifact.json sidecar; manifest: the kind field); an ingest " +
          "append stamps a store built before the metadata existed"))
    QueryHistory.registerArtifact(kind, path)
    Seq(Row(kind, graft.cube.CubeCatalog.normalizePath(path)))
  }
}

/** `MIGRATE GRAFT ARTIFACT FROM '<src>' TO '<dst>' [PROTOCOL <p>]` — the
  * SQL surface of [[graft.operators.ArtifactStore.migrate]]: faithful
  * cross-protocol clone of a pipeline artifact (distributed data rewrite
  * preserving the Hive-partition serving layout; pending tombstones
  * carried; source read-locked and left untouched; destination refused if
  * it already exists). The deployment move the dual-protocol seam exists
  * for — a POSIX store proven on local disk relocates to an object-store
  * root (`file:///…`/`hdfs://…`, manifest protocol over the Hadoop-FS
  * binding) and back, and the destination registers in this session's
  * `graft_artifacts`/ADVISE loop.
  */
case class MigrateGraftArtifactCommand(src: String, dst: String,
    protocol: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("src", StringType, nullable = false)(),
    AttributeReference("dst", StringType, nullable = false)(),
    AttributeReference("dst_protocol", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val kind = graft.operators.ArtifactStore.migrate(spark, src, dst, protocol)
    Seq(Row(kind, src, dst,
      graft.operators.ArtifactStore.forPath(spark, dst).name))
  }
}

/** `PIN GRAFT ARTIFACT '<path>'` — the SQL twin of
  * [[graft.operators.ArtifactStore.pinSnapshot]]: durably pin the
  * manifest-protocol store's CURRENT snapshot so its directories survive
  * any number of replaces until `UNPIN ... ID '<pin_id>'` or the
  * `spark.graft.artifact.pinMaxAgeMs` age bound. Lets a pure-SQL reader
  * (a monitoring session, a long report) hold a consistent world across
  * maintenance cycles without touching the Scala API; the returned
  * `pin_id` re-resolves from any process
  * ([[graft.operators.ManifestArtifactStore.resolvePin]]). POSIX stores
  * refuse (in-place mutation cannot preserve history).
  */
case class PinGraftArtifactCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("pin_id", StringType, nullable = false)(),
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("data_path_count", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (id, snap) = graft.operators.ArtifactStore.forPath(spark, path)
      .pinSnapshot(spark, path)
    Seq(Row(id, path, snap.dataPaths.size.toString))
  }
}

/** `UNPIN GRAFT ARTIFACT '<path>' ID '<pin_id>'` — release a pin taken by
  * `PIN GRAFT ARTIFACT`; the pinned directories become ordinary GC
  * candidates at the next maintenance cycle.
  */
case class UnpinGraftArtifactCommand(path: String, pinId: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("unpinned", StringType, nullable = false)(),
    AttributeReference("path", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    graft.operators.ArtifactStore.forPath(spark, path).unpin(path, pinId)
    Seq(Row(pinId, path))
  }
}

/** `MATERIALIZE GRAFT ROLLUP ON <cube> DIMENSIONS (d, ...) [SKETCH (c, ...)]
  * [PARTITION BY (d, ...)] [CLUSTER BY (d, ...)] AT '<path>'` — declare-an-
  * index as a SQL statement: builds the lattice node (count + sum/min/max of
  * every metric, KMV sketches with measured exactness proofs for the SKETCH
  * columns) and attaches it so matching aggregates route to it. PARTITION BY
  * Hive-partitions leaves under the time bucket by the named dims (dir-level
  * pruning); CLUSTER BY sorts rows inside each leaf (Druid's secondary sort
  * — tight parquet row-group min/max). The SQL twin of
  * [[graft.cube.RollupBuild]]; the reference's equivalent surface is its
  * datasource DDL options (`DefaultSource.scala:197-308`).
  */
case class MaterializeGraftRollupCommand(cube: String, dims: Seq[String],
    sketchCols: Seq[String], partitionDims: Seq[String],
    clusterDims: Seq[String], path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("cube", StringType, nullable = false)(),
    AttributeReference("rollup", StringType, nullable = false)(),
    AttributeReference("stored_rows", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.cube.{CubeCatalog, RollupBuild}
    val attached = RollupBuild.materialize(spark, cube,
      RollupBuild.defaultMeta(cube, dims, sketchCols, path,
        partitionDims = partitionDims, clusterDims = clusterDims))
    val rows = spark.read.parquet(path).count()
    Seq(Row(attached.info.name, s"${dims.mkString("+")}@$path", rows.toString))
  }
}

case class DescribeGraftCubeCommand(name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    DataTypeUtils.toAttributes(StructType.fromDDL(
      "column STRING, role STRING, ndv BIGINT, rollup STRING"))
  override def run(spark: SparkSession): Seq[Row] =
    graft.Graft.describeCube(spark, name).collect().toSeq
}
