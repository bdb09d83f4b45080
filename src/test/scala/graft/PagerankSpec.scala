package graft

import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** Integer-PageRank physics: the driver re-runs the exact ppm recursion
  * over the persisted kNN-graph edges in plain Scala (integer floor
  * division throughout — the same arithmetic both engines execute) and
  * the operator's top-25 must match row for row. Plus structural pins:
  * full node coverage, the damping floor, and rank mass bounded by the
  * initial mass (floor division only leaks downward).
  */
class PagerankSpec extends SparkSpec {

  test("top-25 matches an exact driver recomputation; structure holds") {
    val dir = "/root/testdata/sf0.001"
    val got = Similarity.simGraphPagerank(spark, dir).collect()
    assert(got.length == 25)
    // exact recompute from the same persisted edges
    val base = Similarity.ensureKnnGraphIndex(spark, dir)
    val edges = spark.read.parquet(s"$base/edges")
      .select(col("vec_id").as("src"), col("nbr_id").as("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = edges.map(_._1).distinct.sorted
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to Similarity.pagerankRounds) {
      val inflow = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      edges.foreach { case (s, d) =>
        inflow(d) += rank(s) / deg(s)
      }
      rank = nodes.map(n => n -> (150000L + 85L * inflow(n) / 100L)).toMap
    }
    val expected = nodes.map(n => (n, rank(n)))
      .sortBy { case (n, r) => (-r, n) }.take(25)
    got.zip(expected).foreach { case (row, (n, r)) =>
      assert(row.getAs[Long]("vec_id") == n &&
        row.getAs[Long]("rank_ppm") == r,
        s"rank mismatch at rnk ${row.getAs[Int]("rnk")}: " +
          s"got (${row.getAs[Long]("vec_id")}, ${row.getAs[Long]("rank_ppm")})" +
          s" expected ($n, $r)")
    }
    // structure: damping floor and floor-division mass leak direction
    assert(got.forall(_.getAs[Long]("rank_ppm") >= 150000L))
    assert(rank.values.sum <= nodes.length * 1000000L,
      "integer PageRank mass can only leak downward")
  }
}
