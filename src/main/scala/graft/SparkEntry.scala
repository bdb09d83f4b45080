package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.queries.Core

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one named entry per implemented operator from
  * SURVEY.md §2 (key prefix = operator id); `oracleSql` holds the DuckDB
  * equivalent the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * one plan exercising scan -> broadcast join -> filter -> exact
    * aggregate -> running window -> sort (SURVEY.md §7.2).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate").between(lit("1995-01-01"), lit("1997-12-31 23:59:59")))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val cust = Tables(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val daily = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("o_orderdate").as("date"))
      .agg(Exact.sumFixed(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
        .as("revenue"))
    val w = Window.partitionBy("c_nationkey").orderBy("date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_revenue", sum("revenue").over(w))
      .orderBy("c_nationkey", "date")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_scan_project" -> (Core.s1ScanProject _),
    "s6_trading_calendar" -> (Core.s6Calendar _),
    "p3_inlist" -> (Core.p3InList _),
    "a6_distinct" -> (Core.a6Distinct _),
    "a7_count_distinct" -> (Core.a7CountDistinct _),
    "q1_pricing_summary" -> (Core.q1PricingSummary _),
    "q3_top_orders" -> (Core.q3TopOrders _),
    "q5_nation_revenue" -> (Core.q5NationRevenue _),
  )

  /** DuckDB-equivalent SQL per query (same column names + ORDER BY). */
  def oracleSql: Map[String, String] = Map(
    "s1_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-03-31 23:59:59'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "s6_trading_calendar" ->
      """SELECT d AS date, true AS is_trading_day
        |FROM (SELECT unnest(generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '1996-12-31', INTERVAL 1 DAY)) AS d)
        |WHERE isodow(d) <= 5
        |ORDER BY d""".stripMargin,
    "p3_inlist" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal
        |FROM customer
        |WHERE c_custkey IN (1, 7, 42, 99, 123, 1001)
        |ORDER BY c_custkey""".stripMargin,
    "a6_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority
        |FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "a7_count_distinct" ->
      """SELECT o_orderstatus,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |       count(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / CAST(100 AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / CAST(10000 AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) AS DOUBLE) / CAST(1000000 AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / (count(l_extendedprice) * CAST(100 AS DOUBLE)) AS avg_price,
        |  CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / (count(l_discount) * CAST(100 AS DOUBLE)) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-06-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / CAST(10000 AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / CAST(10000 AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31 23:59:59'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
  )
}
