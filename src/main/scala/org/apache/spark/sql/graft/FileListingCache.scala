package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.FileStatusCache

/** Access to the session-shared file-status (leaf-file listing) cache.
  *
  * `spark.catalog.refreshByPath` recaches cached *query plans* but leaves
  * this listing cache alone, so a path rewritten in place (dynamic partition
  * overwrite — [[graft.cube.CubeRefresh]]) would keep serving the replaced
  * file list and fail with FILE_NOT_EXIST on next read. Placed in the
  * `org.apache.spark.sql` namespace for `private[sql]` access.
  */
object FileListingCache {
  def invalidateAll(spark: SparkSession): Unit =
    FileStatusCache.getOrCreate(spark).invalidateAll()
}
