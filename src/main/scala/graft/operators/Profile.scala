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

  /** `topK > 0` appends a `top_values` column: the k most frequent values
    * as `"value:count"` pairs (heaviest first, ties on the value string) —
    * rendered from a per-column Misra-Gries sketch
    * ([[org.apache.spark.sql.graft.FreqSketch]]), exact while the column's
    * NDV fits the counter budget. One mergeable sketch per column rides
    * the same single aggregate, so the one-scan shape is preserved.
    * (Profile double columns without topK: their string rendering is not
    * cross-engine portable.)
    */
  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean = false, topK: Int = 0): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // exact distinct counts deliberately do NOT ride the main aggregate:
    // several count(DISTINCT x) over different columns rewrite to an
    // Expand that pushes |cols|+1 copies of every row through the
    // aggregation (measured 4x slower at bench scale). Instead each column
    // gets its own pre-aggregated distinct count — a single-column,
    // column-pruned scan with map-side partial aggregation — crossjoined
    // onto the one-row stats result (all sides are scalar).
    val aggs = (count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      (if (exact) Nil
       else Seq(approx_count_distinct(col(c)).as(s"nd_$c"))) ++
        Seq(count(col(c)).as(s"nv_$c"),
          min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"))
    }) ++ (if (topK <= 0) Nil else cols.map { c =>
      org.apache.spark.sql.graft.FreqSketch.freqItems(col(c)).as(s"tv_$c")
    })
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val one =
      if (!exact) stats
      else cols.foldLeft(stats) { (acc, c) =>
        acc.crossJoin(df.select(col(c)).where(col(c).isNotNull).distinct()
          .agg(count(lit(1)).as(s"nd_$c")))
      }
    val entries = cols.map { c =>
      // TRY_CAST: numeric min/max pass through, non-numeric columns profile
      // with NULL bounds instead of a cast failure (same on the oracle side)
      val base = Seq(lit(c).as("col_name"), col("n_rows"),
        col(s"nv_$c").as("n_values"), col(s"nd_$c").as("n_distinct"),
        expr(s"try_cast(mn_$c AS DOUBLE)").as("min_val"),
        expr(s"try_cast(mx_$c AS DOUBLE)").as("max_val"))
      val top =
        if (topK <= 0) Nil
        else Seq(concat_ws(",",
          transform(slice(col(s"tv_$c"), 1, topK),
            e => concat(e.getField("item"), lit(":"),
              e.getField("cnt").cast("string")))).as("top_values"))
      struct(base ++ top: _*)
    }
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** The same profile as ANSI SQL (the differential oracle): one SELECT per
    * column, UNION ALL'd. The `topK` restatement ranks value strings by
    * (count DESC, value ASC) — the sketch's deterministic order.
    */
  def profileSql(table: String, cols: Seq[String], topK: Int = 0): String =
    cols.map { c =>
      val top =
        if (topK <= 0) ""
        else
          s""",
             |  (SELECT string_agg(v || ':' || CAST(cn AS VARCHAR), ',' ORDER BY cn DESC, v)
             |   FROM (SELECT CAST($c AS VARCHAR) AS v, count(*) AS cn FROM $table
             |         WHERE $c IS NOT NULL GROUP BY 1
             |         ORDER BY cn DESC, v LIMIT $topK)) AS top_values""".stripMargin
      s"""SELECT '$c' AS col_name, count(*) AS n_rows, count($c) AS n_values,
         |  count(DISTINCT $c) AS n_distinct,
         |  TRY_CAST(min($c) AS DOUBLE) AS min_val,
         |  TRY_CAST(max($c) AS DOUBLE) AS max_val$top
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")
}
