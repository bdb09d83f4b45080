package graft

import graft.queries.Similarity

/** OPQ rotation audit physics (Ge et al. 2013): on the anisotropic carve
  * (first 16 dims × 4) the unrotated PQ concentrates its quantization
  * error in subspace 0, the Hadamard rotation balances it — and, at
  * 3 bits per 16-dim subspace, leaves TOTAL SSE flat (the linear
  * rate-distortion regime; the honest negative result recorded in
  * [[graft.queries.Similarity.simOpqRotate]]'s scaladoc). Measured at
  * sf0.001/sf0.01: raw spread ≈ 16.6×/16.7× vs rotated ≈ 1.01×; total
  * ratios 0.999/0.997.
  */
class OpqSpec extends SparkSpec {

  test("indexed OPQ ADC serves from the standing rotated codes; rotation is an isometry") {
    val dir = "/root/testdata/sf0.01"
    val rows = Similarity.simOpqAdcIndexed(spark, dir).collect()
    assert(rows.nonEmpty)
    // plan pin: the serve physically reads the standing OPQ index (the
    // sim_ivf_ann_indexed discipline — AQE off so the scan is visible)
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scans = try {
      Similarity.simOpqAdcIndexed(spark, dir)
        .queryExecution.executedPlan.collect {
          case f: FileSourceScanExec if f.relation.location.rootPaths
            .exists(_.toString.contains("opq_index")) => f
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(scans.nonEmpty,
      "indexed OPQ search does not read the standing code table")
    // the Hadamard/8 rotation preserves norms (orthonormal) — the
    // rotated-space ADC is therefore a search of the SAME geometry
    import org.apache.spark.sql.functions._
    val qs = Tables(spark, dir, "embeddings").filter(col("vec_id") < 5)
      .select("vec_id", "embedding")
    val pre = Similarity.opqAniso(spark, dir).filter(col("vec_id") < 5)
      .withColumn("nrm", expr(
        "aggregate(embedding, 0D, (a, x) -> a + x * x)"))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Double]("nrm")).toMap
    val post = Similarity.opqRotateQueries(qs)
      .withColumn("nrm", expr(
        "aggregate(embedding, 0D, (a, x) -> a + x * x)"))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Double]("nrm")).toMap
    pre.foreach { case (id, n) =>
      assert(math.abs(post(id) - n) <= 1e-6 * math.max(1.0, n),
        s"vec $id: rotation changed the norm ($n -> ${post(id)})")
    }
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"rotation balances per-subspace SSE, total stays flat at $dir") {
      val rows = Similarity.simOpqRotate(spark, dir).collect()
      assert(rows.length == 2 * Similarity.pqM)
      def sses(rot: Int): Seq[Double] = rows.toSeq
        .filter(_.getAs[Int]("rotated") == rot)
        .sortBy(_.getAs[Int]("s"))
        .map(_.getAs[Double]("sse"))
      val raw = sses(0)
      val rot = sses(1)
      assert(raw.forall(_ > 0.0) && rot.forall(_ > 0.0))
      val rawSpread = raw.max / raw.min
      val rotSpread = rot.max / rot.min
      info(f"$dir: raw spread=$rawSpread%.2f rotated spread=$rotSpread%.3f " +
        f"total ratio=${rot.sum / raw.sum}%.4f")
      // the carve makes subspace 0 dominate unrotated (measured ~16.6x)
      assert(rawSpread >= 10.0,
        s"anisotropic carve should skew unrotated SSE (spread $rawSpread)")
      // the rotation equalizes distortion (measured spread ~1.01)
      assert(rotSpread <= 1.05,
        s"rotated SSE should be balanced across subspaces (spread $rotSpread)")
      // linear-regime parity on the total (measured 0.999/0.997)
      val ratio = rot.sum / raw.sum
      assert(ratio >= 0.95 && ratio <= 1.05,
        s"total SSE should be flat under the orthogonal rotation ($ratio)")
    }
  }
}
