package graft

import org.apache.spark.sql.functions._
import graft.queries.Similarity

/** Retrain overlay correctness (VERDICT r8 item 2) at every testdata
  * scale — the action half of the drift/retrain maintenance loop:
  *
  *   1. The warm-start guarantee: total post-retrain quantization error
  *      (`sum(new_ssd)`) never exceeds the pre-retrain error
  *      (`sum(old_ssd)`). Warm-starting Lloyd from the frozen centroids
  *      makes this a theorem (every assignment and update half-step is
  *      non-increasing in total squared distance) — the spec pins the
  *      implementation actually delivers it at all three corpus sizes.
  *   2. The audit's exact-integer identities: stayed/moved arithmetic,
  *      full-occupancy conservation (every base + delta vector lands in
  *      exactly one post-retrain cell), and the rewrite set being
  *      non-empty (the admitted delta must land somewhere, and any cell
  *      that gains a member differs from its standing physical list).
  *   3. Search consistency with brute force: probing EVERY cell of the
  *      post-retrain index returns exactly the brute-force cosine top-k
  *      over base + delta (same float_dot arithmetic, same tiebreak), so
  *      the merge-on-read serving view (manifest cells from the overlay,
  *      unchanged cells from the standing index) loses and invents
  *      nothing.
  */
class RetrainSpec extends SparkSpec {

  private val dirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  for (dir <- dirs) {
    test(s"retrain audit at $dir: drift bound + exact identities") {
      val audit = Similarity.simIvfRetrain(spark, dir).collect()
      assert(audit.nonEmpty)
      val oldSsd = audit.flatMap(r => Option(r.getAs[java.lang.Double]("old_ssd"))
        .map(_.doubleValue)).sum
      val newSsd = audit.flatMap(r => Option(r.getAs[java.lang.Double]("new_ssd"))
        .map(_.doubleValue)).sum
      info(s"$dir: quantization error pre=$oldSsd post=$newSsd")
      assert(newSsd <= oldSsd,
        s"warm-start retrain must not increase total quantization error " +
          s"($newSsd > $oldSsd)")

      val nEmb = Tables(spark, dir, "embeddings").count()
      val nDelta = Tables(spark, dir, "embeddings")
        .filter(col("vec_id") % Similarity.upsertDeltaMod === 0).count()
      assert(audit.map(_.getAs[Long]("n_new")).sum == nEmb + nDelta,
        "every base + delta vector must land in exactly one retrained cell")
      assert(audit.map(_.getAs[Long]("n_old")).sum == nEmb + nDelta,
        "the pre-retrain logical state is the full post-upsert occupancy")
      audit.foreach { r =>
        val nOld = r.getAs[Long]("n_old"); val nNew = r.getAs[Long]("n_new")
        val stayed = r.getAs[Long]("stayed")
        assert(stayed <= math.min(nOld, nNew))
        assert(r.getAs[Long]("moved_in") == nNew - stayed)
        assert(r.getAs[Long]("moved_out") == nOld - stayed)
        assert(r.getAs[Boolean]("remapped") ==
          (nNew - stayed + nOld - stayed > 0))
      }
      // the delta has to land somewhere, and any cell gaining a member
      // differs from its standing physical list
      assert(audit.exists(_.getAs[Boolean]("rewritten")),
        "an admitted delta must force at least one physical rewrite")
    }

    test(s"retrained search at $dir: all-cells probe equals brute force") {
      // touching the operator first registers float_dot for the spec SQL
      val nCells = Similarity.simIvfRetrain(spark, dir).count().toInt
      val full = Similarity.simIvfAnnRetrained(spark, dir, nprobe = nCells)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rnk"),
          r.getAs[Long]("vec_id")))
      val uni = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
        .unionByName(Similarity.upsertDeltaFrame(spark, dir))
      val q = uni.filter(col("vec_id").between(0, 4))
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          expr("sqrt(float_dot(embedding, embedding))").as("qnorm"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cosine").desc, col("m_vec_id").asc)
      val brute = uni
        .select(col("vec_id").as("m_vec_id"), col("embedding").as("m_vec"),
          expr("sqrt(float_dot(embedding, embedding))").as("m_norm"))
        .join(broadcast(q))
        .filter(col("m_vec_id") =!= col("qid"))
        .withColumn("cosine",
          expr("float_dot(qvec, m_vec)") / (col("qnorm") * col("m_norm")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rnk"),
          r.getAs[Long]("m_vec_id")))
      assert(full.toSet == brute.toSet,
        s"all-cells retrained search must equal brute force over " +
          s"base + delta at $dir")
    }

    test(s"pq retrain at $dir: warm-start bound + movement identities") {
      val audit = Similarity.simPqRetrain(spark, dir).collect()
      assert(audit.nonEmpty)
      val union = Tables(spark, dir, "embeddings").count() +
        Tables(spark, dir, "embeddings")
          .filter(col("vec_id") % 5 === 0).count()
      audit.groupBy(_.getAs[Int]("s")).foreach { case (s, rows) =>
        // occupancy partitions the union corpus on both sides
        assert(rows.map(_.getAs[Long]("n_before")).sum == union,
          s"subspace $s: before-occupancy must partition base + delta")
        assert(rows.map(_.getAs[Long]("n_after")).sum == union,
          s"subspace $s: after-occupancy must partition base + delta")
        // every vector that entered a codeword left another
        assert(rows.map(_.getAs[Long]("n_entered")).sum ==
          rows.map(_.getAs[Long]("n_left")).sum,
          s"subspace $s: entered/left must balance")
        // the warm-start theorem: per-subspace total SSE is non-increasing
        val oldSse = rows.flatMap(r =>
          Option(r.getAs[java.lang.Double]("old_sse")).map(_.toDouble)).sum
        val newSse = rows.flatMap(r =>
          Option(r.getAs[java.lang.Double]("new_sse")).map(_.toDouble)).sum
        assert(newSse <= oldSse,
          s"subspace $s: warm Lloyd must not increase total SSE ($newSse > $oldSse)")
        // the retrain did real work on this drifted union
        assert(rows.map(_.getAs[Long]("n_entered")).sum > 0,
          s"subspace $s: the reversed-embedding delta must move codes")
      }
    }
  }
}
