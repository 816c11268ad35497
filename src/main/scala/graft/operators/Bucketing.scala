package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-location for the joins the cube layer does NOT eliminate.
  *
  * Star joins collapse into the flat cube (no join at all); everything else
  * — fact-to-fact joins, dedup-pair verification, enrichment against a
  * same-scale table — shuffles both sides on the join key every query. At
  * 100 TB that shuffle IS the query cost. The fix is Spark's bucketing:
  * write both tables hash-partitioned (and sorted) on the join key into the
  * same number of buckets, and every subsequent equi-join on that key plans
  * as a zero-Exchange SortMergeJoin — the shuffle is paid once at layout
  * time, amortized over the workload, exactly like the cube's
  * time-bucketed layout amortizes interval pruning.
  *
  * (The reference never faces this: its only join strategy is to prove the
  * join away against the star schema — SURVEY.md §2.3. Bucketing is the
  * Spark-native answer for the joins that remain.)
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table. Idempotent per table
    * name within a catalog; a stale warehouse directory left by an earlier
    * session (the in-memory catalog forgets it, the filesystem doesn't) is
    * reclaimed by the overwrite.
    */
  def ensureBucketed(spark: SparkSession, df: DataFrame, table: String,
                     key: String, buckets: Int): DataFrame = {
    if (!spark.catalog.tableExists(table)) {
      val stale = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
        table.toLowerCase)
      if (stale.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(stale)
      df.write
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .mode("overwrite")
        .saveAsTable(table)
    }
    // layout artifact like the IVF store / pair index: scans of the
    // bucketed table classify `artifact:bucketed` in query history, not
    // `raw` (the layout is engine-materialized state, not source data).
    // Location comes from the CATALOG, which is correct in any database
    // (<warehouse>/<db>.db/<table>), not just default's flat layout
    graft.plans.QueryHistory.registerArtifact("bucketed",
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
        .location.toString)
    spark.table(table)
  }

  /** Join two same-bucket-count tables on their bucket keys. With both
    * sides laid out by [[ensureBucketed]] this plans with no
    * ShuffleExchange under either join leg (see BucketingSpec's plan
    * assert); broadcast is disabled for the join so the co-located
    * sort-merge path is actually taken and verifiable.
    */
  def cobucketedJoin(left: DataFrame, leftKey: String,
                     right: DataFrame, rightKey: String): DataFrame =
    left.hint("merge").join(right, left(leftKey) === right(rightKey))
}
