package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling: per-column row/value/distinct counts and
  * numeric min/max, in long format (one output row per profiled column) —
  * the data-quality sweep a pipeline runs before training on a new corpus
  * drop.
  *
  * Execution shape: ONE aggregate over ONE scan produces every metric for
  * every requested column; the single result row is then unpivoted with
  * `explode` (driver-sized — |cols| rows). Exact distinct counts rewrite to
  * an `Expand` that replicates the scan |cols|× through the aggregate, so
  * at 100 TB the default is `exact = false`
  * (`approx_count_distinct`, one HLL sketch per column, no Expand); the
  * exact variant exists for oracle-checked correctness and small tables.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def ndv(c: String) =
      if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"nv_$c"), ndv(c).as(s"nd_$c"),
        min(col(c)).cast("double").as(s"mn_$c"),
        max(col(c)).cast("double").as(s"mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col("n_rows"),
        col(s"nv_$c").as("n_values"), col(s"nd_$c").as("n_distinct"),
        col(s"mn_$c").as("min_val"), col(s"mx_$c").as("max_val"))
    }
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** The same profile as ANSI SQL (the differential oracle): one SELECT per
    * column, UNION ALL'd.
    */
  def profileSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows, count($c) AS n_values,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS min_val, CAST(max($c) AS DOUBLE) AS max_val
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")
}
