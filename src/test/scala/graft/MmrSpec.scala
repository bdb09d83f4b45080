package graft

import graft.queries.Similarity

/** MMR re-rank pins: the λ = 1 degenerate case IS the relevance top-k,
  * selection is without replacement with auditable round-1 semantics,
  * and the λ = 1/2 run is measurably more diverse (lower similarity to
  * the already-picked set) than pure relevance on the same shortlist.
  */
class MmrSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("lambda = 1 degenerates to the plain relevance top-k") {
    val mmr = Similarity.simMmrDiverse(spark, dir,
      lambdaNum = 2, lambdaDen = 2).collect()
    val topk = Similarity.simCosineTopk(spark, dir).collect()
      .filter(_.getAs[Int]("rnk") <= Similarity.mmrK)
    assert(mmr.length == topk.length)
    val m = mmr.map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rnk")) ->
      r.getAs[Long]("vec_id")).toMap
    topk.foreach { r =>
      assert(m((r.getAs[Long]("qid"), r.getAs[Int]("rnk"))) ==
        r.getAs[Long]("vec_id"),
        s"qid ${r.getAs[Long]("qid")} rnk ${r.getAs[Int]("rnk")}")
    }
  }

  test("selection is without replacement; round 1 is pure relevance") {
    val rows = Similarity.simMmrDiverse(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.nonEmpty)
    val top1 = Similarity.simCosineTopk(spark, dir).collect()
      .filter(_.getAs[Int]("rnk") == 1)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("vec_id")).toMap
    byQ.foreach { case (qid, rs) =>
      assert(rs.length == Similarity.mmrK)
      assert(rs.map(_.getAs[Long]("vec_id")).distinct.length == rs.length,
        s"qid $qid re-selected a document")
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq ==
        (1 to Similarity.mmrK))
      val r1 = rs.find(_.getAs[Int]("rnk") == 1).get
      assert(r1.getAs[Double]("max_sim") == 0.0)
      assert(r1.getAs[Long]("vec_id") == top1(qid),
        s"qid $qid round 1 is not the relevance argmax")
      // round 1 score is rel·λ with an identically-zero penalty
      assert(r1.getAs[Double]("mmr_score") == r1.getAs[Double]("rel") / 2)
    }
  }

  test("indexed MMR re-ranks the IVF shortlist without replacement") {
    val rows = Similarity.simMmrIndexed(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.nonEmpty)
    // the shortlist IS the standing-index probe search: round 1 (pure
    // relevance) must pick the IVF top-1
    val ivfTop = Similarity.simIvfAnnIndexed(spark, dir,
        nprobe = 2, k = Similarity.mmrShortlist).collect()
      .filter(_.getAs[Int]("rnk") == 1)
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("vec_id")).toMap
    byQ.foreach { case (qid, rs) =>
      assert(rs.length == Similarity.mmrK)
      assert(rs.map(_.getAs[Long]("vec_id")).distinct.length == rs.length)
      val r1 = rs.find(_.getAs[Int]("rnk") == 1).get
      assert(r1.getAs[Long]("vec_id") == ivfTop(qid),
        s"qid $qid: round 1 is not the IVF relevance argmax")
      assert(r1.getAs[Double]("max_sim") == 0.0)
    }
  }

  test("lambda = 1/2 picks are more diverse than pure relevance") {
    val mmr = Similarity.simMmrDiverse(spark, dir).collect()
    val rel = Similarity.simMmrDiverse(spark, dir,
      lambdaNum = 2, lambdaDen = 2).collect()
    // max_sim at pick time records similarity to the already-picked set;
    // MMR explicitly penalizes it, so its sum must not exceed the pure-
    // relevance run's on the same shortlist
    def penalty(rs: Array[org.apache.spark.sql.Row]): Double =
      rs.map(_.getAs[Double]("max_sim")).sum
    assert(penalty(mmr) <= penalty(rel),
      s"MMR picked a MORE redundant set: ${penalty(mmr)} > ${penalty(rel)}")
  }
}
