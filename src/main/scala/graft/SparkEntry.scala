package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables.{dsum, dsumSql, withFlat}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator family from
  * SURVEY.md §2; [[oracleSql]] carries the DuckDB-equivalent SQL the
  * driver uses as a differential oracle. Column names and aggregate
  * aliases match on both sides (the driver hashes columns by name).
  * Double aggregates go through DECIMAL(28,6) (see [[Tables.dsum]]) so
  * results are bit-identical regardless of summation order.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q7-shape on the flat cube — the reference's flagship win
    * (reference `docs/benchmark/BenchMarkDetails.org:525-537`).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_nation_volume")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.4 aggregations ------------------------------------------------
    "q01_pricing_summary" -> { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    "q02_basic_agg" -> { (s, dir) =>
      // "Basic Aggregation" benchmark shape: 2 dims, count/sum/max/avg/distinct
      Tables.flat(s, dir)
        .groupBy("c_mktsegment", "l_returnflag")
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("l_extendedprice")).as("sum_price"),
          max(col("l_quantity")).as("max_qty"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          countDistinct(col("o_custkey")).as("n_cust"))
        .orderBy("c_mktsegment", "l_returnflag")
    },
    // ---- §2.3 star join collapse + §2.9 time extraction -------------------
    "q07_nation_volume" -> { (s, dir) =>
      val f = Tables.flat(s, dir)
      f.filter((col("s_nation") === "NATION_20" && col("c_nation") === "NATION_11") ||
               (col("s_nation") === "NATION_11" && col("c_nation") === "NATION_20"))
        .groupBy(col("s_nation"), col("c_nation"),
                 year(col("l_shipdate")).as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("s_nation", "c_nation", "l_year")
    }
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
         |  ${dsumSql("l_quantity")} / count(*) AS avg_qty,
         |  ${dsumSql("l_extendedprice")} / count(*) AS avg_price,
         |  ${dsumSql("l_discount")} / count(*) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_basic_agg" -> withFlat(
      s"""SELECT c_mktsegment, l_returnflag,
         |  count(*) AS cnt,
         |  ${dsumSql("l_extendedprice")} AS sum_price,
         |  max(l_quantity) AS max_qty,
         |  ${dsumSql("l_quantity")} / count(*) AS avg_qty,
         |  count(DISTINCT o_custkey) AS n_cust
         |FROM olps
         |GROUP BY c_mktsegment, l_returnflag
         |ORDER BY c_mktsegment, l_returnflag""".stripMargin),
    "q07_nation_volume" -> withFlat(
      s"""SELECT s_nation, c_nation,
         |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM olps
         |WHERE (s_nation = 'NATION_20' AND c_nation = 'NATION_11')
         |   OR (s_nation = 'NATION_11' AND c_nation = 'NATION_20')
         |GROUP BY s_nation, c_nation, l_year
         |ORDER BY s_nation, c_nation, l_year""".stripMargin)
  )
}
