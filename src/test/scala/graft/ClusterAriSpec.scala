package graft

import org.apache.spark.sql.functions._
import graft.queries.Similarity

/** ARI/NMI cluster-eval pins (VERDICT r14 item 4): a planted
  * two-clustering with the full contingency arithmetic hand-computed,
  * the ARI=1 identity on equal clusterings, label-permutation
  * invariance, and the corpus report's internal identities.
  */
class ClusterAriSpec extends SparkSpec {

  test("planted two-clustering: hand-computed exact rational ARI + NMI") {
    import spark.implicits._
    // cells {1:(x,x,x), 2:(x,y,y)} over n=6:
    //   S = C(3,2)+C(1,2)+C(2,2) = 4; A = 3+3 = 6; B = C(4,2)+C(2,2) = 7
    //   P = C(6,2) = 15 -> ari = 2(15*4 - 42)/(15*13 - 84) = 36/111
    //   ppm = 147000000 // 111 - 1000000 = 324324
    // whole-bit NMI: ha = 3(2-1)+3(2-1) = 6; hb = 4(2-2)+2(2-1) = 2
    //   mi = 3(ilog 18 - ilog 12) + 1(ilog 6 - ilog 12) + 2(ilog 12 - ilog 6)
    //      = 3(4-3) + (2-3) + 2(3-2) = 4
    val assign = Seq((1L, "x"), (1L, "x"), (1L, "x"),
      (2L, "x"), (2L, "y"), (2L, "y")).toDF("cell", "label")
    val r = Similarity.clusterAriOver(assign).collect().head
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("n_cells") == 2L && r.getAs[Long]("n_labels") == 2L)
    assert(r.getAs[Long]("sum_nij_c2") == 4L)
    assert(r.getAs[Long]("sum_a_c2") == 6L)
    assert(r.getAs[Long]("sum_b_c2") == 7L)
    assert(r.getAs[Long]("ari_num") == 36L)
    assert(r.getAs[Long]("ari_den") == 111L)
    assert(r.getAs[Long]("ari_ppm") == 324324L)
    assert(r.getAs[Long]("mi_bits") == 4L)
    assert(r.getAs[Long]("ha_bits") == 6L)
    assert(r.getAs[Long]("hb_bits") == 2L)
  }

  test("identical clusterings score ARI exactly 1.0") {
    import spark.implicits._
    val assign = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"),
      (3L, "c"), (3L, "c"), (3L, "c")).toDF("cell", "label")
    val r = Similarity.clusterAriOver(assign).collect().head
    assert(r.getAs[Long]("ari_num") == r.getAs[Long]("ari_den"))
    assert(r.getAs[Long]("ari_ppm") == 1000000L)
  }

  test("degenerate corpus (one cell, one label) renders NMI as perfect agreement") {
    // ADVICE r15: both entropy surrogates vanish (ha = hb = 0 — every
    // ilog2 term is ilog2(n·n) − ilog2(n·n) = 0), so the unguarded ppm
    // division would ANSI-throw; the CASE emits the perfect-agreement
    // 1000000 instead, mirrored in the DuckDB twin.
    import spark.implicits._
    val assign = Seq((1L, "x"), (1L, "x"), (1L, "x")).toDF("cell", "label")
    val r = Similarity.clusterAriOver(assign).collect().head
    assert(r.getAs[Long]("ha_bits") == 0L && r.getAs[Long]("hb_bits") == 0L)
    assert(r.getAs[Long]("nmi_ppm") == 1000000L)
    // ARI degenerates the same way (den = P·2P − 2P² = 0) — same guard
    assert(r.getAs[Long]("ari_den") == 0L)
    assert(r.getAs[Long]("ari_ppm") == 1000000L)
  }

  test("ARI is invariant under label permutation") {
    import spark.implicits._
    val base = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "y"),
      (2L, "y"), (2L, "x"), (3L, "x"), (3L, "y"))
    val a = Similarity.clusterAriOver(base.toDF("cell", "label"))
      .collect().head
    val b = Similarity.clusterAriOver(
      base.map { case (c, l) => (c, if (l == "x") "y" else "x") }
        .toDF("cell", "label")).collect().head
    Seq("ari_num", "ari_den", "ari_ppm", "mi_bits", "nmi_ppm").foreach(c =>
      assert(a.getAs[Long](c) == b.getAs[Long](c), c))
  }

  test("corpus report: identities hold; chance correction bites") {
    val r = Similarity.simClusterAri(spark, "/root/testdata/sf0.01")
      .collect().head
    val (num, den) = (r.getAs[Long]("ari_num"), r.getAs[Long]("ari_den"))
    assert(den > 0L && math.abs(num) <= den)
    assert(r.getAs[Long]("ari_ppm") ==
      (num + den) * 1000000L / den - 1000000L)
    assert(r.getAs[Long]("nmi_ppm") ==
      (2 * r.getAs[Long]("mi_bits") + r.getAs[Long]("ha_bits") +
        r.getAs[Long]("hb_bits")) * 1000000L /
        (r.getAs[Long]("ha_bits") + r.getAs[Long]("hb_bits")) - 1000000L)
    // labels are random classes, cells are geometry: purity reads
    // non-trivial (majority share ~1/|labels|+) but chance-corrected
    // agreement must be near zero — the reason ARI sits beside purity
    assert(math.abs(r.getAs[Long]("ari_ppm")) < 100000L,
      "random-label ARI should be near zero")
  }
}
