package graft.cube

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cube statistics sidecar (`_graft_stats.json`): dimension NDVs (the role
  * Druid column cardinality plays for the reference's cost gate,
  * `DruidDataSource.scala:45-51`), the covered time interval (reference
  * `QueryIntervals.scala:40-132` index intervals), and whether the time
  * column is day-quantized. Computed once per materialized cube path.
  */
object CubeStats {

  /** Read-or-compute the stats for a materialized cube. */
  def ensure(spark: SparkSession, info: CubeInfo, path: String): Map[String, Long] = {
    val sidecar = new java.io.File(path, "_graft_stats.json")
    val existing: Option[Map[String, Long]] =
      if (!sidecar.exists()) None
      else {
        val txt = new String(java.nio.file.Files.readAllBytes(sidecar.toPath), "UTF-8")
        val m = "\"([^\"]+)\"\\s*:\\s*(-?\\d+)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toLong).toMap
        // regenerate older-format sidecars: missing time-range/quantization
        // keys, OR missing lag measurements for any currently-declared
        // correlated column (an all-NULL column leaves a `__lag_null_<c>`
        // sentinel, so its absence still distinguishes "measured" from
        // "sidecar predates the declaration")
        val lagCovered = info.timeCorrelatedColumns
          .filter(info.columnByName.contains)
          .forall(c => m.contains(s"__lag_min_us_$c") || m.contains(s"__lag_null_$c"))
        if (m.contains("__time_subday") && m.contains("__time_nulls") && lagCovered)
          Some(m)
        else None
      }
    existing.getOrElse {
      val dims = info.columns.filter(_.role != ColumnRole.Metric).map(_.name)
      val tcol = col(info.timeColumn)
      val corr = info.timeCorrelatedColumns.filter(info.columnByName.contains)
      // lag of the time dimension against each declared correlated column,
      // in micros, over rows where both are non-NULL (min/max skip NULLs)
      val lagAggs = corr.flatMap { c =>
        val lag = unix_micros(tcol.cast("timestamp")) -
          unix_micros(col(c).cast("timestamp"))
        Seq(min(lag).as(s"lagmin_$c"), max(lag).as(s"lagmax_$c"))
      }
      val row = graft.Graft.withoutRewrites(spark) { spark.read.parquet(path)
        .select((dims.map(c => approx_count_distinct(col(c)).as(c))
          :+ unix_micros(min(tcol).cast("timestamp")).as("tmin")
          :+ unix_micros(max(tcol).cast("timestamp")).as("tmax")
          // UTC-day quantization (pure epoch arithmetic, session-TZ-free:
          // a session-TZ date_trunc would certify "midnight in Kolkata")
          :+ max(when(pmod(unix_micros(tcol.cast("timestamp")),
              lit(86400000000L)) =!= 0L, 1L).otherwise(0L)).as("subday")
          :+ count(when(tcol.isNull, 1)).as("tnulls")) ++ lagAggs: _*)
        .head() }
      val lagStats = corr.zipWithIndex.flatMap { case (c, i) =>
        val base = dims.size + 4 + 2 * i
        if (row.isNullAt(base) || row.isNullAt(base + 1))
          Seq(s"__lag_null_$c" -> 1L) // all-NULL column: sentinel, no bounds
        else Seq(s"__lag_min_us_$c" -> row.getLong(base),
          s"__lag_max_us_$c" -> row.getLong(base + 1))
      }
      val stats = dims.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap ++
        Map("__time_min_us" -> row.getLong(dims.size),
            "__time_max_us" -> row.getLong(dims.size + 1),
            "__time_subday" -> row.getLong(dims.size + 2),
            "__time_nulls" -> row.getLong(dims.size + 3)) ++ lagStats
      val json = stats.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
      java.nio.file.Files.write(sidecar.toPath, json.getBytes("UTF-8"))
      stats
    }
  }

  /** Attach stats to the cube descriptor (column NDVs, time interval,
    * quantization flag).
    */
  def withStats(info: CubeInfo, stats: Map[String, Long]): CubeInfo =
    info.copy(
      columns = info.columns.map(c => c.copy(cardinality = stats.get(c.name))),
      timeIntervalMicros = for {
        lo <- stats.get("__time_min_us")
        hi <- stats.get("__time_max_us")
      } yield (lo, hi),
      timeDayQuantized = stats.get("__time_subday").contains(0L),
      timeNullFree = stats.get("__time_nulls").contains(0L),
      timeLagBounds = info.timeCorrelatedColumns.flatMap { c =>
        for {
          lo <- stats.get(s"__lag_min_us_$c")
          hi <- stats.get(s"__lag_max_us_$c")
        } yield c -> ((lo, hi))
      }.toMap)
}
