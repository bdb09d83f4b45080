package graft

import org.apache.spark.sql.functions._
import graft.queries.Similarity

/** SemDeDup over the standing kNN graph: the offline numpy model (exact
  * descent replication — LSH bucket rule, ring strides, 4 local-join
  * rounds, τ = 0.35 filter, union-find closure) precomputes the cluster
  * structure at both corpora, so the counts pinned here are facts, not
  * hopes: 64 clusters / 263 clustered vectors (largest 17) at sf0.001,
  * 79 / 295 (largest 24) at sf0.01. Structural identities (keep-first =
  * member minimum, edges stay in-cluster) are pinned independently of
  * the model.
  */
class SemdedupGraphSpec extends SparkSpec {

  test("offline-modeled cluster structure at sf0.001 and sf0.01") {
    for ((dir, nClusters, nClustered, largest) <- Seq(
        ("/root/testdata/sf0.001", 64, 263L, 17L),
        ("/root/testdata/sf0.01", 79, 295L, 24L))) {
      val rows = Similarity.ddSemdedupGraph(spark, dir).collect()
      assert(rows.length == nClusters,
        s"$dir: expected $nClusters clusters, got ${rows.length}")
      assert(rows.map(_.getAs[Long]("n_members")).sum == nClustered,
        s"$dir: clustered-vector total")
      assert(rows.map(_.getAs[Long]("n_members")).max == largest,
        s"$dir: largest cluster")
    }
  }

  test("keep-first survivor is the member minimum; edges stay in-cluster") {
    val dir = "/root/testdata/sf0.001"
    val rows = Similarity.ddSemdedupGraph(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("keep_vec_id") == r.getAs[Long]("component"),
        "min-label components make the keeper the component label itself")
      assert(r.getAs[Long]("n_dropped") == r.getAs[Long]("n_members") - 1)
      assert(r.getAs[Long]("n_members") >= 2,
        "a cluster needs at least one in-threshold edge")
      assert(r.getAs[Long]("n_edges") >= r.getAs[Long]("n_members") - 1,
        "connectivity needs at least a spanning set of directed edges")
    }
    // every in-threshold edge endpoint is clustered, and the directed
    // edge count splits exactly across clusters
    val base = Similarity.ensureKnnGraphIndex(spark, dir)
    val ge = spark.read.parquet(s"$base/edges")
      .filter(col("cosine") >= Similarity.knnGraphDupTau)
    val endpoints = ge.select(col("vec_id")).unionByName(
      ge.select(col("nbr_id").as("vec_id"))).distinct().count()
    assert(rows.map(_.getAs[Long]("n_members")).sum == endpoints,
      "clustered vectors = distinct edge endpoints")
    assert(rows.map(_.getAs[Long]("n_edges")).sum == ge.count(),
      "every in-threshold directed edge lands in exactly one cluster")
  }
}
