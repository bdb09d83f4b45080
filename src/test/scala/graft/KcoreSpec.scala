package graft

import org.apache.spark.sql.functions._
import graft.queries.Similarity

/** k-core peel pins: multi-round cascade hand-traced on a planted
  * triangle-with-tail, trace conservation (survivors(r) =
  * survivors(r−1) − removed(r), XOR algebra included), and the real
  * corpus converging inside the fixed round budget with every survivor
  * meeting the threshold in the final subgraph.
  */
class KcoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def und(pairs: (Long, Long)*) = {
    import spark.implicits._
    val d = pairs.toDF("v", "u")
    d.unionByName(d.select(col("u").as("v"), col("v").as("u")))
  }

  test("a planted tail peels one hop per round into the triangle core") {
    import spark.implicits._
    // triangle 1-2-3 (degree 2 in-core) with tail 3-4, 4-5: at k=2 the
    // tail end 5 (deg 1) peels in round 1, exposing 4 (deg 2 -> 1) for
    // round 2; the triangle survives with n_removed hitting 0 in round 3
    val verts = Seq(1L, 2L, 3L, 4L, 5L).toDF("v")
    val edges = und((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val rows = Similarity.kcoreOver(spark, verts, edges, 2, 4).collect()
    def at(r: Int) = rows.find(_.getAs[Int]("round") == r).get
    assert(at(1).getAs[Long]("n_removed") == 1)
    assert(at(1).getAs[Long]("removed_xor") == 5L)
    assert(at(2).getAs[Long]("n_removed") == 1)
    assert(at(2).getAs[Long]("removed_xor") == 4L)
    assert(at(3).getAs[Long]("n_removed") == 0)
    assert(at(3).getAs[Long]("n_remaining") == 3)
    assert(at(3).getAs[Long]("survivor_xor") == (1L ^ 2L ^ 3L))
    assert(at(4).getAs[Long]("n_removed") == 0) // stable once converged
  }

  test("trace conserves counts and XOR algebra on the real corpus") {
    val rows = Similarity.simGraphKcore(spark, dir).collect()
      .sortBy(_.getAs[Int]("round"))
    assert(rows.length == Similarity.kcoreRounds)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_remaining") ==
          a.getAs[Long]("n_remaining") - b.getAs[Long]("n_removed"))
        // removing X from survivors S: xor(S minus X) = xor(S) ^ xor(X)
        assert(b.getAs[Long]("survivor_xor") ==
          (a.getAs[Long]("survivor_xor") ^ b.getAs[Long]("removed_xor")))
      case _ =>
    }
    // the fixed round budget converges on this corpus: the last round
    // removes nothing (the in-output convergence witness)
    assert(rows.last.getAs[Long]("n_removed") == 0,
      s"peel did not converge in ${Similarity.kcoreRounds} rounds")
    assert(rows.last.getAs[Long]("n_remaining") > 0,
      "degenerate peel: everything was removed")
  }

  test("an upsert's bidirectional links change core membership (mutated-view pin)") {
    import spark.implicits._
    // base: triangle 1-2-3 plus 3-4; at k=2 vertex 4 (deg 1) peels in
    // round 1. The mutated view adds inserted vertex -5 linked
    // bidirectionally to 3 AND 4 (the HNSW connect): 4 now holds deg 2
    // and the WHOLE graph survives — the membership flip the post-
    // mutation audit exists to expose.
    val verts = Seq(1L, 2L, 3L, 4L).toDF("v")
    val baseEdges = und((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val baseRows = Similarity.kcoreOver(spark, verts, baseEdges, 2, 2).collect()
    def at(rows: Array[org.apache.spark.sql.Row], r: Int) =
      rows.find(_.getAs[Int]("round") == r).get
    assert(at(baseRows, 1).getAs[Long]("n_removed") == 1)
    assert(at(baseRows, 1).getAs[Long]("removed_xor") == 4L)
    val mutVerts = verts.unionByName(Seq(-5L).toDF("v"))
    val mutEdges = baseEdges.unionByName(und((-5L, 3L), (-5L, 4L)))
    val mutRows = Similarity.kcoreOver(spark, mutVerts, mutEdges, 2, 2).collect()
    assert(at(mutRows, 1).getAs[Long]("n_removed") == 0)
    assert(at(mutRows, 1).getAs[Long]("n_remaining") == 5)
    assert(at(mutRows, 1).getAs[Long]("survivor_xor") ==
      (1L ^ 2L ^ 3L ^ 4L ^ -5L))
  }

  test("mutated-view audit peels the merged graph consistently on the corpus") {
    // physics over the real corpus: the mutated trace obeys the same
    // conservation algebra as the base trace, and round 0 starts from
    // live base + inserted vertices (the vertex-set contract)
    val rows = Similarity.simGraphKcoreMutated(spark, dir).collect()
      .sortBy(_.getAs[Int]("round"))
    assert(rows.length == Similarity.kcoreRounds)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_remaining") ==
          a.getAs[Long]("n_remaining") - b.getAs[Long]("n_removed"))
        assert(b.getAs[Long]("survivor_xor") ==
          (a.getAs[Long]("survivor_xor") ^ b.getAs[Long]("removed_xor")))
      case _ =>
    }
    val nEmb = Tables(spark, dir, "embeddings").count()
    val nDead = Tables(spark, dir, "embeddings")
      .filter(col("vec_id") % Similarity.graphDelMod ===
        Similarity.graphDelRem).count()
    val nIns = Tables(spark, dir, "embeddings")
      .filter(col("vec_id") % Similarity.upsertDeltaMod === 0).count()
    val r1 = rows.head
    assert(r1.getAs[Long]("n_removed") + r1.getAs[Long]("n_remaining") ==
      nEmb - nDead + nIns)
  }

  test("merged mutated edges are (v, u)-unique — the no-distinct invariant") {
    // simGraphKcoreMutated unions repaired-overlay edges with the
    // bidirectional insert links WITHOUT distinct, while the DuckDB twin's
    // UNION dedups: the engines agree only while the union is
    // duplicate-free (disjoint by id sign, top-k-unique within each side).
    // Pin it so a future duplicate-producing change fails here, loudly,
    // instead of as a drifting peel-degree hash (r14 ADVICE).
    val dupes = Similarity.mergedMutatedEdges(spark, dir)
      .groupBy("v", "u").count().filter(col("count") > 1).count()
    assert(dupes == 0L, s"$dupes duplicate (v, u) edges in the merged view")
  }

  test("trace matches an independent in-memory peel; core meets the threshold") {
    val base = Similarity.ensureKnnGraphIndex(spark, dir)
    val directed = spark.read.parquet(s"$base/edges")
      .select(col("vec_id").as("v"), col("nbr_id").as("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutual = directed.filter { case (a, b) => directed((b, a)) }
    var alive = Tables(spark, dir, "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val trace = Similarity.simGraphKcore(spark, dir).collect()
      .sortBy(_.getAs[Int]("round"))
    trace.foreach { row =>
      val deg = mutual.toSeq
        .filter { case (a, b) => alive(a) && alive(b) }
        .groupBy(_._1).map { case (v, es) => v -> es.size }
      val removed = alive.filter(v =>
        deg.getOrElse(v, 0) < Similarity.kcoreK)
      assert(row.getAs[Long]("n_removed") == removed.size.toLong,
        s"round ${row.getAs[Int]("round")}")
      assert(row.getAs[Long]("removed_xor") ==
        removed.foldLeft(0L)(_ ^ _))
      alive = alive -- removed
      assert(row.getAs[Long]("n_remaining") == alive.size.toLong)
      assert(row.getAs[Long]("survivor_xor") == alive.foldLeft(0L)(_ ^ _))
    }
    // the invariant the core defines: min degree >= k inside the core
    val coreDeg = mutual.toSeq
      .filter { case (a, b) => alive(a) && alive(b) }
      .groupBy(_._1).map { case (_, es) => es.size }
    assert(alive.nonEmpty && coreDeg.forall(_ >= Similarity.kcoreK))
  }
}
