package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Exact, Tables}

/** Aggregation-surface extensions beyond the reference's plain groupBy
  * (SURVEY.md §2.5 notes the reference has no grouping sets / pivot /
  * percentiles): the shapes a warehouse workload adds first, each with
  * map-side partial aggregation and bounded output.
  */
object Aggregates {

  /** Long→wide pivot (the inverse of U2 melt): revenue per orderstatus
    * pivoted into columns per priority class. The pivot values are
    * declared explicitly so the plan is a single pass (no extra job to
    * discover distinct values).
    */
  def u4Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(Exact.sumFixed(col("o_totalprice"), 2))
      .withColumnsRenamed(Map(
        "1-URGENT" -> "p1_urgent", "2-HIGH" -> "p2_high",
        "3-MEDIUM" -> "p3_medium", "4-NOT SPECIFIED" -> "p4_not_specified",
        "5-LOW" -> "p5_low"))
      .orderBy("o_orderstatus")

  /** ROLLUP over (returnflag, linestatus): subtotals and a grand total in
    * one shuffle — the grouping-sets surface.
    */
  def a9Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** GROUPING SETS: independent (lang) and (source) marginals plus the
    * grand total of the documents corpus in ONE pass — the generalized
    * form of [[a9Rollup]]'s hierarchy, and the shape a corpus dashboard
    * computes (per-language and per-source token mass are separate
    * marginals, not nested levels). Spark expands the sets into a single
    * Expand + hash aggregate: one scan, partial map-side combine, no
    * self-union of scans. `grouping_id()` disambiguates the NULL rows
    * exactly like DuckDB's GROUPING_ID().
    */
  def a11GroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .groupingSets(Seq(Seq(col("lang")), Seq(col("source")), Seq()),
        col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("tokens"),
        expr("grouping_id(lang, source)").as("gid"))
      .orderBy(col("gid"), col("lang").asc_nulls_first,
        col("source").asc_nulls_first)

  /** Exact percentiles (25/50/75) of an integral-valued measure per group.
    * Spark's `percentile` and DuckDB's `quantile_cont` both use linear
    * interpolation over the sorted values; on integral quantities the
    * interpolated midpoints are exact in double.
    */
  def o4Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("q25"),
        expr("percentile(l_quantity, 0.5)").as("q50"),
        expr("percentile(l_quantity, 0.75)").as("q75"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** HyperLogLog++ approximate distinct — the sketch that replaces exact
    * count-distinct at 100 TB (mergeable partial sketches, no giant
    * shuffle of raw keys). No SQL oracle: sketch estimates are
    * implementation-specific; the spec bounds the relative error against
    * the exact count instead.
    */
  def a8ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Approximate quantiles via the Greenwald-Khanna sketch
    * (`percentile_approx`) — mergeable partials like HLL, the scale
    * replacement for exact sort-based percentiles. No SQL oracle (sketch
    * internals are engine-specific); the spec bounds the rank error
    * against the exact values.
    */
  def a10ApproxQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        expr("percentile_approx(o_totalprice, array(0.25, 0.5, 0.75), 1000)")
          .as("approx_q"),
        count(lit(1)).as("n_rows"))
      .selectExpr("o_orderstatus", "approx_q[0] AS q25", "approx_q[1] AS q50",
        "approx_q[2] AS q75", "n_rows")
      .orderBy("o_orderstatus")
}
