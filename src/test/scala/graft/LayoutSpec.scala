package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Storage-layout proofs: date partitioning must prune partitions at the
  * scan, and same-bucketing must eliminate the join shuffle.
  */
class LayoutSpec extends SparkSpec {

  test("date-partitioned writes prune partitions under a date filter") {
    val dir = Files.createTempDirectory("graft-part").toString + "/orders"
    Layout.writeDatePartitioned(
      Tables(spark, "/root/testdata/sf0.001", "orders"), dir, "o_orderdate")
    val q = Layout.readDateRange(spark, dir, "o_orderdate",
      "1996-03-01", "1996-05-31")
      .select("o_orderkey", "o_totalprice")
    // the physical proof: the scan carries non-empty PartitionFilters.
    // FileScan metadata strings truncate at 100 chars by default, and how
    // far ">= 199603" sits into the PartitionFilters entry depends on the
    // width of the session-global expression IDs — widen the cap so the
    // assertion doesn't depend on how many plans earlier suites built.
    val prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    val plan = try {
      spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
      q.queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    assert(plan.contains("PartitionFilters: [isnotnull(_p_year") &&
      plan.contains("+ _p_month") && plan.contains(">= 199603"),
      s"no partition filters in:\n$plan")
    // and results equal the unpartitioned read
    val expected = Tables(spark, "/root/testdata/sf0.001", "orders")
      .filter(col("o_orderdate").between(lit("1996-03-01"), lit("1996-05-31")))
      .count()
    assert(q.count() == expected)
  }

  test("co-bucketed tables join without a shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Layout.saveBucketed(
        Tables(spark, "/root/testdata/sf0.001", "orders"), "orders_b", 4,
        Seq("o_orderkey"))
      Layout.saveBucketed(
        Tables(spark, "/root/testdata/sf0.001", "lineitem")
          .withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", 4,
        Seq("o_orderkey"))
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join should have no shuffle exchange:\n$plan")
      // equal to the plain join
      val expected = Tables(spark, "/root/testdata/sf0.001", "lineitem").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("a dropped catalog entry re-attaches to the surviving bucketed files without a rebuild") {
    // VERDICT r11 item 5: every fresh Bench session re-materialized the
    // fuzzy lifecycle tables because the in-memory catalog dies with the
    // session while the warehouse files survive. saveBucketed now writes
    // explicit-path tables and ensureBucketedAttached re-DECLARES them;
    // this pins: files untouched (no rebuild), rows identical, and the
    // re-attached table still consumed as bucketed.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val src = Tables(spark, "/root/testdata/sf0.001", "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      Layout.saveBucketed(src, "attach_b", 4, Seq("o_orderkey"))
      val before = spark.table("attach_b").orderBy("o_orderkey").collect()
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "attach_b")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def dataMtimes = fs.listStatus(loc)
        .filter(_.getPath.getName.startsWith("part-"))
        .map(f => f.getPath.getName -> f.getModificationTime).sortBy(_._1).toSeq
      val t0 = dataMtimes
      assert(t0.nonEmpty, "external bucketed write left no data files")
      // a DROP on the explicit-path table loses the catalog entry only —
      // the fresh-session situation
      spark.sql("DROP TABLE attach_b")
      assert(fs.exists(loc), "DROP of the explicit-path table deleted data")
      assert(Layout.ensureBucketedAttached(spark, "attach_b"),
        "re-attach failed with files on disk")
      assert(dataMtimes == t0, "re-attach rewrote the data files")
      assert(spark.table("attach_b").orderBy("o_orderkey").collect()
        .toSeq == before.toSeq, "re-attached rows differ")
      // still consumed as bucketed: self-join on the bucket key plans
      // with no Exchange
      val joined = spark.table("attach_b").select("o_orderkey")
        .join(spark.table("attach_b"), "o_orderkey")
      assert(!joined.queryExecution.executedPlan.toString.contains("Exchange"),
        "re-attached table lost bucket consumption")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS attach_b")
    }
  }
}
