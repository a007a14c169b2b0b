package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Relational operator inventory (SURVEY §2.2, §2.5-2.9) expressed over the
  * driver's TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Oracle-parity conventions (doubles are order-sensitive across engines):
  *  - counts/ints → BIGINT on both sides
  *  - money math → cast clean 2dp doubles to DECIMAL at the column, all
  *    arithmetic exact in decimal, then FINAL-SELECT the decimal as
  *    `round(cast(x as double), s)` at the decimal's own scale s — the
  *    driver hashes DECIMAL and DOUBLE differently, so decimal types must
  *    never reach the output schema. Rounding at the decimal's own scale is
  *    a bit-exact no-op in both engines (the double is already the nearest
  *    to an s-dp value), unlike rounding to fewer digits which can hit
  *    half-up/shortest-repr tie differences.
  *  - ratios → exact decimal/integer operands cast to double, divide last
  *  - temporal outputs → DATE or formatted string, never raw timestamps
  *    (Spark writes UTC-adjusted parquet timestamps; DuckDB naive)
  */
object Relational {
  private val dec2 = DecimalType(18, 2)
  private val dec4 = DecimalType(18, 4)
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  // l_discount/l_tax are clean 2dp in [0,0.1); exact as DECIMAL(4,2).
  private def d2(c: Column) = c.cast(DecimalType(4, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1/A11-style full-scan agg: TPC-H Q1 shape (grouped sums, counts, avg).
    "q01_pricing_summary" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity").cast(dec2)).cast(dec2).cast("double"), 2).as("sum_qty"),
          round(sum(col("l_extendedprice").cast(dec2)).cast(dec2).cast("double"), 2).as("sum_base_price"),
          round(sum((col("l_extendedprice").cast(dec2) * (lit(1).cast(DecimalType(2, 0)) - d2(col("l_discount")))).cast(dec4))
            .cast(dec4).cast("double"), 4).as("sum_disc_price"),
          (sum(col("l_quantity").cast(dec2)).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // J1: multi-way join lineitem⋈orders⋈customer⋈nation⋈region + agg
    // (broadcast the small dims; TPC-H Q5 shape).
    "q02_revenue_by_nation" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
        .agg(
          round(sum((col("l_extendedprice").cast(dec2) * (lit(1).cast(DecimalType(2, 0)) - d2(col("l_discount")))).cast(dec4))
            .cast(dec4).cast("double"), 4).as("revenue"),
          count(lit(1)).as("line_count"))
        .orderBy("region_name", "nation_name")
    }),

    // W4: top-k per group — top-3 customers by revenue per nation.
    "q03_top_customers_per_nation" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val rev = o.groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast(dec2)).cast(dec2).as("revenue"))
      val w = Window.partitionBy("n_name").orderBy(col("revenue").desc, col("c_custkey").asc)
      rev.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("n_name").as("nation_name"), col("c_custkey").cast("long").as("custkey"),
          round(col("revenue").cast("double"), 2).as("revenue"), col("rk").cast("long").as("rk"))
        .orderBy("nation_name", "rk")
    }),

    // A2-style pivot: orders count per (year, status) pivoted to columns
    // (reference crosstab table_gold_member_activity_yearly.py:171-188).
    "q04_order_status_pivot" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.withColumn("order_year", year(col("o_orderdate")).cast("long"))
        .groupBy("order_year")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .count()
        .na.fill(0L, Seq("O", "F", "P"))
        .select(col("order_year"), col("O").as("n_open"), col("F").as("n_filled"), col("P").as("n_partial"))
        .orderBy("order_year")
    }),

    // A3/A5: countDistinct metrics per group. Two COUNT(DISTINCT)s in one
    // agg would trigger Spark's Expand (3× the shuffle volume of the
    // largest table — the 100 TB bottleneck); instead each distinct count
    // is a dedup-then-count with full map-side combine, joined on the
    // group key (supplier cardinality ≪ lineitem, AQE broadcasts).
    "q05_supplier_part_stats" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_suppkey").cast("long").as("suppkey"),
          col("l_partkey"), col("l_orderkey"), col("l_quantity"))
      // count(col) after the distinct skips a NULL key, matching
      // COUNT(DISTINCT c) (count(lit(1)) would count NULL as a value).
      def distinctCount(c: String, as: String) =
        li.select("suppkey", c).distinct()
          .groupBy("suppkey").agg(count(col(c)).as(as))
      val qty = li.groupBy("suppkey")
        .agg(round(sum(col("l_quantity").cast(dec2)).cast(dec2).cast("double"), 2).as("total_qty"))
      qty.join(distinctCount("l_partkey", "n_parts"), Seq("suppkey"))
        .join(distinctCount("l_orderkey", "n_orders"), Seq("suppkey"))
        .select(col("suppkey"), col("n_parts"), col("n_orders"), col("total_qty"))
        .orderBy("suppkey")
    }),

    // W1: dense rank per year by customer revenue (reference dense-rank
    // tie semantics: rank on the value only). dense_rank PARTITION BY year
    // would sort each whole year in one task (parallelism ≤ #years); since
    // only ranks ≤ 5 survive, RankOps.denseRankTopK computes the same
    // result with a bounded combinable aggregate + broadcast join — the
    // decimal revenue rides through its exact unscaled-long encoding.
    "q06_customer_year_rank" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val yr = o.withColumn("order_year", year(col("o_orderdate")).cast("long"))
        .groupBy("order_year", "o_custkey")
        .agg(sum(col("o_totalprice").cast(dec2)).cast(dec2).as("revenue"))
      graft.operators.RankOps.denseRankTopK(yr, Seq("order_year"),
          (col("revenue") * 100).cast("long"), k = 5, rankCol = "rev_rank")
        .select(col("order_year"), col("o_custkey").cast("long").as("custkey"),
          round(col("revenue").cast("double"), 2).as("revenue"), col("rev_rank"))
        .orderBy(col("order_year"), col("rev_rank"), col("custkey"))
    }),

    // J7: FK-integrity anti-join — orders whose customer is missing
    // (reference merge.py:76-94). Synthetic data is clean → count row.
    "q07_fk_orphans" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val orphans = o.join(c, col("o_custkey") === col("c_custkey"), "left_anti")
      orphans.agg(count(lit(1)).as("orphan_count"))
    }),

    // §2.9 cross join grid + left join + zero-fill (reference member×year
    // grid, table_gold_member_activity_yearly.py:206-226).
    "q08_nation_year_grid" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val years = o.select(year(col("o_orderdate")).cast("long").as("order_year")).distinct()
      val grid = n.select(col("n_nationkey"), col("n_name").as("nation_name")).crossJoin(years)
      val metrics = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), year(col("o_orderdate")).cast("long").as("order_year"))
        .agg(count(lit(1)).as("n_orders_raw"))
      grid.join(metrics,
          grid("n_nationkey") === metrics("c_nationkey") && grid("order_year") === metrics("order_year"),
          "left")
        .select(col("nation_name"), grid("order_year"),
          coalesce(col("n_orders_raw"), lit(0L)).as("n_orders"))
        .orderBy("nation_name", "order_year")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE), 2) AS sum_qty,
        |  ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE), 2) AS sum_base_price,
        |  ROUND(CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE), 4) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_revenue_by_nation" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
        |  ROUND(CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE), 4) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY region_name, nation_name""".stripMargin,

    "q03_top_customers_per_nation" ->
      """WITH rev AS (
        |  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue
        |  FROM orders GROUP BY o_custkey
        |), ranked AS (
        |  SELECT n_name AS nation_name, c_custkey AS custkey, revenue,
        |    ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY revenue DESC, c_custkey ASC) AS rk
        |  FROM rev JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |)
        |SELECT nation_name, CAST(custkey AS BIGINT) AS custkey,
        |  ROUND(CAST(revenue AS DOUBLE), 2) AS revenue, CAST(rk AS BIGINT) AS rk
        |FROM ranked WHERE rk <= 3 ORDER BY nation_name, rk""".stripMargin,

    "q04_order_status_pivot" ->
      """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
        |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
        |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
        |  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_partial
        |FROM orders GROUP BY 1 ORDER BY order_year""".stripMargin,

    "q05_supplier_part_stats" ->
      """SELECT CAST(l_suppkey AS BIGINT) AS suppkey,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |  ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE), 2) AS total_qty
        |FROM lineitem GROUP BY 1 ORDER BY suppkey""".stripMargin,

    "q06_customer_year_rank" ->
      """WITH yr AS (
        |  SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS order_year, o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue
        |  FROM orders GROUP BY 1, 2
        |)
        |SELECT order_year, CAST(o_custkey AS BIGINT) AS custkey,
        |  ROUND(CAST(revenue AS DOUBLE), 2) AS revenue,
        |  CAST(DENSE_RANK() OVER (PARTITION BY order_year ORDER BY revenue DESC) AS BIGINT) AS rev_rank
        |FROM yr QUALIFY rev_rank <= 5
        |ORDER BY order_year, rev_rank, custkey""".stripMargin,

    "q07_fk_orphans" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS orphan_count
        |FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)""".stripMargin,

    "q08_nation_year_grid" ->
      """WITH years AS (SELECT DISTINCT CAST(YEAR(o_orderdate) AS BIGINT) AS order_year FROM orders),
        |grid AS (SELECT n_nationkey, n_name AS nation_name, order_year FROM nation CROSS JOIN years),
        |metrics AS (
        |  SELECT c_nationkey, CAST(YEAR(o_orderdate) AS BIGINT) AS order_year, COUNT(*) AS n_orders_raw
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2
        |)
        |SELECT g.nation_name AS nation_name, g.order_year AS order_year,
        |  CAST(COALESCE(m.n_orders_raw, 0) AS BIGINT) AS n_orders
        |FROM grid g LEFT JOIN metrics m
        |  ON g.n_nationkey = m.c_nationkey AND g.order_year = m.order_year
        |ORDER BY g.nation_name, g.order_year""".stripMargin,
  )
}
