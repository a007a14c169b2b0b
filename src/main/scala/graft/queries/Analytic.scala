package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** OLAP analytics beyond the reference's surface (it has no grouping
  * sets and no percentiles — SURVEY §2.6): rollup sub-totals and exact
  * interpolated percentiles, both oracle-checked. These exercise the
  * operators the engine's own optimizer rule must coexist with —
  * rollup legitimately plans an Expand (one output row per grouping
  * set, unavoidable and correct), unlike the multi-distinct Expand
  * that RewriteMultiDistinctCounts removes.
  */
object Analytic {
  private val dec2 = DecimalType(18, 2)
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ROLLUP (year, status): per-cell, per-year and grand totals in one
    // pass. Synthetic o_orderdate is never null, so 'ALL' labels are
    // unambiguous rollup markers.
    "q60_status_rollup" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.withColumn("yr", year(col("o_orderdate")).cast("long"))
        .rollup("yr", "o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice").cast(dec2)).cast(dec2).cast("double"), 2).as("total_price"))
        .select(coalesce(col("yr").cast("string"), lit("ALL")).as("order_year"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("order_status"),
          col("n_orders"), col("total_price"))
        .orderBy("order_year", "order_status")
    }),

    // Exact interpolated percentiles (R-7, the convention Spark's
    // `percentile` and DuckDB's `quantile_cont` share): quartiles + p90
    // of lineitem quantity per return flag. Quantities are small
    // integers, so the interpolation arithmetic is exact in doubles on
    // both engines.
    "q61_quantity_percentiles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy("l_returnflag")
        .agg(
          percentile(col("l_quantity"), lit(0.25)).as("p25"),
          percentile(col("l_quantity"), lit(0.5)).as("p50"),
          percentile(col("l_quantity"), lit(0.75)).as("p75"),
          percentile(col("l_quantity"), lit(0.9)).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),
  )

  val oracles: Map[String, String] = Map(

    "q60_status_rollup" ->
      """WITH o AS (SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
        |    o_orderstatus AS st, CAST(o_totalprice AS DECIMAL(18,2)) AS tp
        |  FROM orders)
        |SELECT COALESCE(CAST(yr AS VARCHAR), 'ALL') AS order_year,
        |  COALESCE(st, 'ALL') AS order_status,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  ROUND(CAST(CAST(SUM(tp) AS DECIMAL(18,2)) AS DOUBLE), 2) AS total_price
        |FROM o GROUP BY ROLLUP(yr, st)
        |ORDER BY order_year, order_status""".stripMargin,

    "q61_quantity_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  quantile_cont(l_quantity, 0.9) AS p90,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
