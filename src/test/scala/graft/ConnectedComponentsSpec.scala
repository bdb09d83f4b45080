package graft

import org.apache.spark.sql.functions._

/** [[ConnectedComponents]] (alternating large-star/small-star) against an
  * independent driver-side union-find, on shapes that stress the
  * contraction: long chains (worst case for label propagation — the
  * algorithm must converge in O(log² n) rounds, not O(n)), stars,
  * multi-component forests, duplicate/self-loop edges, and a seeded
  * random graph.
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def unionFind(n: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    n.map(x => x -> find(x)).toMap
  }

  private def runCc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = spark.createDataFrame(edges).toDF("src", "dst")
    ConnectedComponents.run(df, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.filter { n =>
      edges.exists(e => e._1 != e._2 && (e._1 == n || e._2 == n))
    }
    val expected = unionFind(nodes, edges.filter(e => e._1 != e._2))
    assert(runCc(edges) == expected)
  }

  test("chain graph contracts to its minimum (label propagation's worst case)") {
    check((1L until 64L).map(i => (i, i + 1)))
  }

  test("reversed chain and shuffled orientations give the same components") {
    check((1L until 64L).map(i => (i + 1, i)).reverse)
    check((1L until 64L).map(i => if (i % 2 == 0) (i, i + 1) else (i + 1, i)))
  }

  test("forest of disjoint components keeps components apart") {
    check(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L)))
  }

  test("self-loops and duplicate edges are tolerated, isolated nodes dropped") {
    val got = runCc(Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L)))
    // 5 only ever appears in a self-loop → not a member of any edge set
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("empty edge set yields an empty result") {
    val empty = spark.createDataFrame(
      Seq.empty[(Long, Long)]).toDF("src", "dst")
    assert(ConnectedComponents.run(empty, "src", "dst")
      .collect().isEmpty)
  }

  test("seeded random graph matches union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
    check(edges)
  }

  test("maxIter exhaustion fails loudly instead of returning wrong labels") {
    // a chain needs at least one contraction round; maxIter = 0 must
    // throw, never silently read components off the raw edge set
    val chain = spark.createDataFrame((1L until 10L).map(i => (i, i + 1)))
      .toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.run(chain, "src", "dst", maxIter = 0)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("high-degree hub (power-law shape) needs no per-node neighborhood buffer") {
    // star with 5,000 leaves — the shape that kills collect_list-based CC
    check((1L to 5000L).map(i => (0L, i)))
  }
}
