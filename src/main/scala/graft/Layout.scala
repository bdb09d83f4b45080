package graft

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout policies for the 100 TB deployment (SURVEY.md §7.4.3).
  *
  * The reference writes one flat parquet file per dataset
  * (`storage/parquet.py` / `wrds_ingestion.py:1004-1007`) — fine for a
  * laptop, useless at scale. Panel datasets here can be written
  * date-partitioned (`year=YYYY/month=M`) so date-range queries prune
  * whole directories, and entity-bucketed so per-key joins and as-of
  * lookups co-locate without a shuffle.
  */
object Layout {

  /** Write a panel dataset partitioned by (year, month) of its date
    * column. Readers filtering on `dateCol` prune partitions: the scan's
    * PartitionFilters handles year/month directories and row-group stats
    * handle the rest.
    */
  def writeDatePartitioned(df: DataFrame, path: String,
      dateCol: String = "date"): Unit =
    df.withColumn("year", year(col(dateCol)))
      .withColumn("month", month(col(dateCol)))
      .write.mode("overwrite")
      .partitionBy("year", "month")
      .parquet(path)

  /** Read a date-partitioned dataset and re-derive the plain schema. */
  def readDatePartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("year", "month")

  /** Date-range read over a date-partitioned dataset. A predicate on the
    * *data* column alone does not prune partitions — Spark cannot infer
    * `year/month` bounds from `date BETWEEN …` — so this derives the
    * partition predicates explicitly and conjoins them. This is the read
    * path a 100 TB deployment must use: directory pruning first,
    * row-group stats second.
    */
  def readDateRange(spark: SparkSession, path: String, dateCol: String,
      start: String, end: String): DataFrame = {
    val s = java.sql.Timestamp.valueOf(start + " 00:00:00").toLocalDateTime
    val e = java.sql.Timestamp.valueOf(end + " 00:00:00").toLocalDateTime
    val ym = col("year") * 100 + col("month")
    spark.read.parquet(path)
      .filter(ym >= lit(s.getYear * 100 + s.getMonthValue) &&
        ym <= lit(e.getYear * 100 + e.getMonthValue))
      .filter(col(dateCol).between(
        lit(start).cast("timestamp"), lit(end).cast("timestamp")))
      .drop("year", "month")
  }

  /** Save a dataset as a bucketed+sorted table: joins and aggregations on
    * `keys` between tables bucketed the same way need no shuffle — the
    * exchange that dominates fact-fact joins at 100 TB disappears from
    * the plan entirely (verified in LayoutSpec).
    */
  def saveBucketed(df: DataFrame, table: String, numBuckets: Int,
      keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
