package graft

import org.apache.spark.sql.functions._
import graft.queries.Text

/** Quality-aware canonical selection per duplicate cluster: the planted
  * corpus was offline-modeled with the exact md5 minhash-band rule
  * (band collisions verified, not hoped for) and the per-mille quality
  * formula, so both pins below are precomputed facts: cluster {10,11}
  * is a quality TIE (identical texts, q=695) and must resolve to the
  * lower id; cluster {20,21} has the LOWER id dirty (trailing "!!!"
  * token, q=592 vs 695) and must resolve to the higher-id clean doc —
  * quality beats id order.
  */
class ClusterRepSpec extends SparkSpec {

  test("planted clusters: argmax quality, lowest-id tiebreak") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-crep").toString
    Seq(
      (10L, "c1 c2 c3 c4 c5 c6 c7 c8", "en", "src0"),
      (11L, "c1 c2 c3 c4 c5 c6 c7 c8", "en", "src0"),
      (20L, "b1 b2 b3 b4 b5 b6 b7 b8 !!!", "en", "src0"),
      (21L, "b1 b2 b3 b4 b5 b6 b7 b8", "en", "src0"),
      (30L, "z1 z2 z3 z4 z5 z6 z7 z8", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Text.ddClusterRepresentative(spark, dir).collect()
    assert(rows.length == 2, s"singleton 30 must not form a cluster: ${rows.toSeq}")
    val byComp = rows.map(r => r.getAs[Long]("component") -> r).toMap
    val a = byComp(10L)
    assert(a.getAs[Long]("rep_doc_id") == 10L &&
      a.getAs[Long]("rep_q") == 695L &&
      a.getAs[Long]("cluster_size") == 2L &&
      a.getAs[Long]("n_dropped") == 1L &&
      a.getAs[Long]("member_id_sum") == 21L,
      s"quality tie must resolve to the lower id: $a")
    val b = byComp(20L)
    assert(b.getAs[Long]("rep_doc_id") == 21L &&
      b.getAs[Long]("rep_q") == 695L &&
      b.getAs[Long]("cluster_size") == 2L &&
      b.getAs[Long]("member_id_sum") == 41L,
      s"quality must beat id order: $b")
  }

  test("argmax keeps its map-side partial phase, never a per-cluster window") {
    // the A2/dd_paragraph skew rule made physical: a web-scale hot
    // cluster must collapse map-side (partial_max of the (q, -id)
    // struct), not funnel into one window hash partition
    val plan = SparkEntry.queries("dd_cluster_representative")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("partial_max"),
      "cluster-representative argmax lost its map-side combine")
  }

  test("natural corpus: one representative per cluster, q is the member max") {
    val dir = "/root/testdata/sf0.001"
    val reps = Text.ddClusterRepresentative(spark, dir).collect()
    val clusters = Text.ddDupClusters(spark, dir).collect()
    assert(reps.nonEmpty && clusters.nonEmpty)
    val members = clusters.groupBy(_.getAs[Long]("component"))
      .view.mapValues(_.map(_.getAs[Long]("doc_id")).toSet).toMap
    assert(reps.map(_.getAs[Long]("component")).toSet == members.keySet,
      "exactly one representative row per connected component")
    reps.foreach { r =>
      val comp = r.getAs[Long]("component")
      assert(members(comp).contains(r.getAs[Long]("rep_doc_id")),
        s"representative of $comp must be a member")
      assert(r.getAs[Long]("cluster_size") == members(comp).size.toLong)
      assert(r.getAs[Long]("member_id_sum") == members(comp).sum)
    }
  }
}
