package graft

import graft.queries.Text

/** GDPR-forget pins: the label erase + re-point semantics hand-traced on
  * a planted cluster set, zero post-forget references on every surface,
  * per-surface row conservation, and the corpus leg finding exactly the
  * requested erasure set.
  */
class GdprSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("relabel hand-traces: erased members leave, tombstoned labels re-point") {
    import spark.implicits._
    // cluster 7 = {7, 9, 12} named by tombstoned 7 -> re-points to 9;
    // cluster 3 = {3, 4} untouched; cluster 20 = {20, 21} fully erased
    val labels = Seq((7L, 7L), (9L, 7L), (12L, 7L), (3L, 3L), (4L, 3L),
      (20L, 20L), (21L, 20L)).toDF("id", "component")
    val tomb = Seq(7L, 20L, 21L).toDF("doc_id")
    val out = Text.gdprRelabel(labels, tomb).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("component"))).toSet
    assert(out == Set((9L, 9L), (12L, 9L), (3L, 3L), (4L, 3L)))
  }

  test("no surface serves a tombstoned id after the forget") {
    val rows = Text.pipelineGdprForget(spark, dir).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getAs[Long]("after_refs") == 0L,
        s"${r.getAs[String]("surface")} still references erased ids")
    }
    val byName = rows.map(r => r.getAs[String]("surface") -> r).toMap
    // row conservation: surfaces keyed by a single doc id (and the edge
    // set, where a referencing row IS a removed row) lose exactly their
    // referencing rows
    for (s <- Seq("corpus", "fuzzy_bands", "fuzzy_sh", "bm25_postings",
        "bm25_doclens", "cc_edges"))
      assert(byName(s).getAs[Long]("after_total") ==
        byName(s).getAs[Long]("n_total") - byName(s).getAs[Long]("n_refs"),
        s)
    // labels keep component-only-referencing rows (they re-point)
    val lab = byName("cc_labels")
    assert(lab.getAs[Long]("after_total") >=
      lab.getAs[Long]("n_total") - lab.getAs[Long]("n_refs"))
    // the corpus leg found EXACTLY the requested erasure batch
    val tombXor = Text.gdprTombstones(spark, dir).collect()
      .map(_.getLong(0)).foldLeft(0L)(_ ^ _)
    assert(byName("corpus").getAs[Long]("erased_xor") == tombXor)
    assert(byName("corpus").getAs[Long]("n_refs") > 0,
      "vacuous audit: the corpus holds no erasure requests")
  }
}
