package graft.cube

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic rollup materialization for ANY registered cube — the lattice's
  * user-facing API. Declare a [[RollupMeta]] (dimensions, count/sum/min/max
  * metrics, HLL/KMV/quantile/heavy-hitter sketch columns) and this
  *
  *   1. builds the node from the materialized flat cube with the same
  *      meta-driven aggregate shapes [[CubeRefresh]] uses for incremental
  *      rebuilds (so refresh keeps custom nodes current too),
  *   2. measures the exactness proofs the lossless rewrites require —
  *      exact NDV and NULL counts of every sketched column, total fact
  *      rows for the quantile saturation gate,
  *   3. attaches the node to the catalog and descriptor sidecar,
  *      coarsest-first (fewest dims), so [[graft.plans.RollupRouting]]
  *      serves matching aggregates from it automatically.
  *
  * [[RollupCube]] (the TPC-H lattice) is one instance of this machinery;
  * EventsCubeSpec drives the same path over a single-table events cube.
  * At 100 TB this is the "declare an index" operation: one pass over the
  * facts per node, everything downstream is metadata.
  */
object RollupBuild {

  def materialize(spark: SparkSession, cubeName: String,
                  ru0: RollupMeta): RegisteredCube = {
    val cube = CubeCatalog.get(cubeName).getOrElse(throw new IllegalArgumentException(
      s"no registered cube named $cubeName — materialize/attach the cube first"))
    // builds and proofs run with rewrites OFF: the measurement must never
    // route through the sketches it is meant to vouch for
    graft.Graft.withoutRewrites(spark) {
      val flat = spark.read.parquet(cube.cubePath)
      // attach the node's CURRENT generation (CubeGenerations) — after a
      // refresh the serving dir is a `.gen-N` sibling of the build root
      val ru0r = ru0.copy(path = CubeGenerations.currentDir(ru0.path))
      if (!new java.io.File(ru0r.path, "_SUCCESS").exists()) {
        val node = CubeRefresh.buildNode(flat, cube.info, ru0r)
          .repartition(col(ru0r.timeBucketColumn))
        // sort prefix = the write's partition columns, or the dynamic-
        // partition writer re-sorts (unstably) and drops the clustering
        val clustered =
          if (ru0r.clusterDims.isEmpty) node
          else node.sortWithinPartitions(
            ((ru0r.timeBucketColumn +: ru0r.partitionDims) ++ ru0r.clusterDims)
              .map(col): _*)
        clustered.write.mode("overwrite")
          .partitionBy(ru0r.timeBucketColumn +: ru0r.partitionDims: _*)
          .parquet(ru0r.path)
      }
      val ru = withProofs(flat, ru0r)
      val attached = cube.copy(rollups =
        (cube.rollups.filterNot(_.path == ru.path) :+ ru)
          .sortBy(_.dims.size))
      CubeCatalog.register(attached)
      CubeMeta.save(attached)
      attached
    }
  }

  /** Auto-indexing: turn a workload-driven [[RollupAdvisor.Recommendation]]
    * into a materialized, attached lattice node. Metrics default to every
    * Metric-role column of the cube (count + sum/min/max) so any mergeable
    * aggregate the workload used is covered; recommended sketch columns
    * become KMV sketches whose exactness proofs are measured at build. The
    * full loop — `RollupAdvisor.recommend(workload).map(fromRecommendation)`
    * — is the operator's "index my workload" command: after it, the
    * analyzed queries stop touching the fact table entirely.
    */
  def fromRecommendation(spark: SparkSession, cubeName: String,
                         rec: RollupAdvisor.Recommendation,
                         path: String): RegisteredCube =
    materialize(spark, cubeName,
      defaultMeta(cubeName, rec.dims, rec.sketchCols, path))

  /** The default node shape for a dimension set: count + sum/min/max of
    * every Metric-role column (covering all mergeable aggregates) and a KMV
    * sketch per requested distinct-count column. Shared by
    * [[fromRecommendation]] and the `MATERIALIZE GRAFT ROLLUP` SQL command.
    */
  def defaultMeta(cubeName: String, dims: Seq[String],
                  sketchCols: Seq[String], path: String,
                  partitionDims: Seq[String] = Nil,
                  clusterDims: Seq[String] = Nil): RollupMeta = {
    val cube = CubeCatalog.get(cubeName).getOrElse(throw new IllegalArgumentException(
      s"no registered cube named $cubeName — materialize/attach the cube first"))
    require(partitionDims.forall(dims.contains),
      s"PARTITION BY columns must be node dimensions; got ${partitionDims.mkString(",")}")
    require(clusterDims.forall(dims.contains),
      s"CLUSTER BY columns must be node dimensions; got ${clusterDims.mkString(",")}")
    val metrics = cube.info.columns
      .filter(_.role == ColumnRole.Metric).map(_.name)
    RollupMeta(
      path = path,
      dims = dims,
      timeBucketColumn = cube.info.timeBucketColumn,
      countColumn = "cnt",
      sums = metrics.map(m => m -> s"sum_$m").toMap,
      mins = metrics.map(m => m -> s"min_$m").toMap,
      maxs = metrics.map(m => m -> s"max_$m").toMap,
      kmvSketches = sketchCols.map(c => c -> s"${c}_kmv").toMap,
      partitionDims = partitionDims,
      clusterDims = clusterDims)
  }

  /** Measure the exactness proofs for a node's sketched columns. */
  private def withProofs(flat: DataFrame, ru: RollupMeta): RollupMeta = {
    val cols = (ru.kmvSketches.keys ++ ru.freqSketches.keys ++
      ru.freqWeighted.flatMap(t => Seq(t._1, t._2))).toSeq.distinct.sorted
    if (cols.isEmpty && ru.quantileSketches.isEmpty) return ru
    val row = flat.select(
      (cols.map(c => countDistinct(col(c)).as(c))
        ++ cols.map(c => count(when(col(c).isNull, 1)).as("n_" + c))
        :+ count(lit(1)).as("__total_rows__")): _*).head()
    val ndv = cols.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap
    val nulls = cols.zipWithIndex.map { case (c, i) =>
      c -> row.getLong(cols.size + i) }.toMap
    ru.copy(kmvExactNdv = ru.kmvExactNdv ++ ndv,
      exactNullCount = ru.exactNullCount ++ nulls,
      totalRows = Some(row.getLong(2 * cols.size)))
  }
}
