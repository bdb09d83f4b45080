package graft

import graft.queries.Similarity

/** The retrieval-quality report as data (VERDICT r14 item 3): metric
  * identities every family row must satisfy, plus measured pins that
  * tie the report back to the existing recall specs — the report must
  * REPRODUCE IvfRecallSpec/BqRecallSpec's floors, not restate them.
  */
class IrMetricsSpec extends SparkSpec {

  private def rowsAt(dir: String) =
    Similarity.simIrMetrics(spark, dir).collect()
      .map(r => r.getAs[String]("family") -> r).toMap

  test("metric identities hold for every family (sf0.001)") {
    val rows = rowsAt("/root/testdata/sf0.001")
    assert(rows.keySet == Set("bm25", "bq", "filtered", "graph", "hnsw",
      "ivf", "ivfpq", "opq", "pq", "rrf", "sq"))
    rows.values.foreach { r =>
      val nQ = r.getAs[Long]("n_q")
      val hits = r.getAs[Long]("hits5")
      assert(nQ == 5L)
      assert(hits >= 0L && hits <= 5 * nQ)
      assert(r.getAs[Long]("recall_micro") == hits * 1000000L / (5 * nQ))
      assert(r.getAs[Long]("rr60_sum") <= 60 * nQ)
      assert(r.getAs[Long]("dcg2_sum") <= 7 * nQ)
      assert(r.getAs[Long]("mrr_micro") ==
        r.getAs[Long]("rr60_sum") * 1000000L / (60 * nQ))
      assert(r.getAs[Long]("ndcg_micro") ==
        r.getAs[Long]("dcg2_sum") * 1000000L / (7 * nQ))
      // a first relevant hit exists iff any hit exists
      assert((r.getAs[Long]("rr60_sum") > 0) == (hits > 0))
      // perfect recall forces perfect nDCG: all 5 relevant docs occupy
      // all 5 positions, so every position weight is earned
      if (hits == 5 * nQ)
        assert(r.getAs[Long]("ndcg_micro") == 1000000L)
    }
  }

  test("the report reproduces the recall-spec operating points") {
    // sf0.001 measured pins (deterministic corpus + serve):
    // IvfRecallSpec's shipped point 0.92, the graph walk scaladoc's
    // 0.88, BQ's reranked 1.0, and the documented pure-ADC weakness
    val r1 = rowsAt("/root/testdata/sf0.001")
    assert(r1("ivf").getAs[Long]("recall_micro") == 920000L)
    assert(r1("graph").getAs[Long]("recall_micro") == 880000L)
    assert(r1("bq").getAs[Long]("recall_micro") == 1000000L)
    // FilteredAnnSpec's documented selectivity penalty (0.48 at the
    // unfiltered shipped depth nprobe=2) and the layered walk's 0.84
    assert(r1("filtered").getAs[Long]("recall_micro") == 480000L)
    assert(r1("hnsw").getAs[Long]("recall_micro") == 840000L)
    assert(r1("pq").getAs[Long]("recall_micro") <= 400000L,
      "pure-ADC PQ recall should stay documented-low on this corpus")
    // sf0.01: the IvfRecallSpec floor (measured 0.92) and BQ's 0.88-era
    // floor hold as >= pins (recall, not equality — corpus-specific)
    val r2 = rowsAt("/root/testdata/sf0.01")
    assert(r2("ivf").getAs[Long]("recall_micro") >= 900000L)
    assert(r2("bq").getAs[Long]("recall_micro") >= 880000L)
  }

  test("operating-point curves agree with the matrix at the shipped knobs") {
    // identity pins (r16): the beam curve's beam = 16 row IS the
    // matrix's graph serve vs the same full truth, and the rerank
    // curve's pq row at the shipped L = 50 reproduces the PqRecallSpec
    // operating point (recall vs the exact-L2 truth) as data.
    val dir = "/root/testdata/sf0.001"
    val matrix = rowsAt(dir)
    val beam = Similarity.simBeamCurve(spark, dir).collect()
      .map(r => r.getAs[Int]("beam") -> r.getAs[Long]("recall_micro")).toMap
    assert(beam.keySet == Set(4, 8, 16))
    assert(beam(16) == matrix("graph").getAs[Long]("recall_micro"),
      "beam-16 curve row must equal the matrix's graph serve")
    val rerank = Similarity.simRerankCurve(spark, dir).collect()
      .map(r => (r.getAs[String]("family"), r.getAs[Int]("l")) ->
        r.getAs[Long]("recall_micro")).toMap
    // PqRecallSpec floors at this corpus: 0.75 at L=50, 0.99 at L=150
    assert(rerank(("pq", 50)) >= 750000L)
    assert(rerank(("pq", 150)) >= 990000L)
    // the shortlist-prefix argument: recall is monotone in L per family
    Seq("pq", "opq").foreach { f =>
      assert(rerank((f, 10)) <= rerank((f, 50)) &&
        rerank((f, 50)) <= rerank((f, 150)), f)
    }
  }

  test("deletion preserves retrieval quality (post-delete report)") {
    val rows = Similarity
      .simIrMetricsDeleted(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[String]("family") -> r).toMap
    assert(rows.keySet == Set("bq", "graph", "ivf", "opq", "pq", "sq"))
    rows.values.foreach { r =>
      val nQ = r.getAs[Long]("n_q")
      assert(nQ == 5L)
      assert(r.getAs[Long]("recall_micro") ==
        r.getAs[Long]("hits5") * 1000000L / (5 * nQ))
      assert(r.getAs[Long]("ndcg_micro") ==
        r.getAs[Long]("dcg2_sum") * 1000000L / (7 * nQ))
    }
    // measured sf0.001 pins: the exact-rerank families hold their
    // pre-delete class against the live-corpus truth (bq 1.0,
    // graph 0.92 — the FreshDiskANN bridge repair routing around
    // holes, ivf 0.88); the pure-ADC rows stay documented-low
    assert(rows("bq").getAs[Long]("recall_micro") == 1000000L)
    assert(rows("graph").getAs[Long]("recall_micro") == 920000L)
    assert(rows("ivf").getAs[Long]("recall_micro") == 880000L)
    assert(rows("pq").getAs[Long]("recall_micro") <= 400000L)
  }

  test("mutation preserves retrieval quality (post-mutation report)") {
    val rows = Similarity
      .simIrMetricsMutated(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[String]("family") -> r).toMap
    assert(rows.keySet == Set("graph_gen2", "hnsw_deleted", "hnsw_upserted"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_q") == 5L)
      assert(r.getAs[Long]("recall_micro") ==
        r.getAs[Long]("hits5") * 1000000L / (5 * r.getAs[Long]("n_q")))
    }
    // measured sf0.001 pins: all three mutated serves hold the graph
    // family's pre-mutation class (0.92) against their own-corpus truth
    // — compaction, insertion and deletion each preserve walk quality
    rows.values.foreach(r =>
      assert(r.getAs[Long]("recall_micro") == 920000L,
        s"${r.getAs[String]("family")}: ${r.getAs[Long]("recall_micro")}"))
  }
}
