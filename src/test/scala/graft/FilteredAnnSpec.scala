package graft

import org.apache.spark.sql.functions._
import graft.queries.Similarity

/** Metadata-filtered ANN over the standing IVF index: every hit must
  * satisfy the predicate, the post-scoring filter must commute with
  * ranking (the operator's filter-then-rank ≡ rank-then-filter — the
  * identity its oracle relies on), and the label-id projection must be
  * a pruned scan with the predicate pushed to parquet.
  */
class FilteredAnnSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every filtered hit carries the filter label, and hits exist") {
    val hits = Similarity.simFilteredAnnIndexed(spark, dir)
    val labels = Tables(spark, dir, "embeddings").select("vec_id", "label")
    val joined = hits.join(labels, "vec_id").collect()
    assert(joined.nonEmpty, "filtered search returned no rows")
    assert(joined.forall(_.getAs[Int]("label") == Similarity.filteredAnnLabel),
      "a hit escaped the metadata filter")
  }

  test("filter-then-rank equals rank-then-filter on the real corpus") {
    // rank-then-filter: the UNfiltered indexed search ranked to corpus
    // depth, label-filtered afterwards, re-cut to k — must reproduce the
    // operator's rows exactly (cosine independence across members)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("vec_id").asc)
    val allowed = Tables(spark, dir, "embeddings")
      .filter(col("label") === Similarity.filteredAnnLabel)
      .select("vec_id")
    val post = Similarity.simIvfAnnIndexed(spark, dir, k = 1000000)
      .join(allowed, Seq("vec_id"), "left_semi")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("qid", "vec_id", "cell", "cosine", "rnk")
      .orderBy("qid", "rnk").collect()
    val got = Similarity.simFilteredAnnIndexed(spark, dir).collect()
    assert(got.nonEmpty && got.map(_.toSeq).toSeq == post.map(_.toSeq).toSeq,
      "post-filtering the full ranking drifted from the filtered search")
  }

  test("filtered recall vs filtered exact: the selectivity penalty and its nprobe cure, measured") {
    // the honest physics (recorded like the matryoshka negative): a ~10%
    // label filter thins every probed cell tenfold, so the filtered
    // exact top-5 spreads across far more cells than the unfiltered one
    // — recall at the unfiltered shipped depth (2) drops to ~0.48
    // (unfiltered: 0.92), and the cure is deeper probing, exactly what
    // the scaladoc's label-partitioned-index swap buys back at scale
    val exact = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cosine").desc, col("vec_id").asc)
      val e = Tables(spark, dir, "embeddings")
        .filter(col("label") === Similarity.filteredAnnLabel)
      graft.queries.Similarity.simCosineTopk(spark, dir, None, 1000000)
        .join(e.select("vec_id"), Seq("vec_id"), "left_semi")
        .withColumn("r2", row_number().over(w)).filter(col("r2") <= 5)
        .collect().groupBy(_.getAs[Long]("qid"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    }
    def recallAt(np: Int): Double = {
      val got = Similarity.simFilteredAnnIndexed(spark, dir, nprobe = np)
        .collect().groupBy(_.getAs[Long]("qid"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
      val per = exact.map { case (q, t) =>
        (got.getOrElse(q, Set.empty[Long]) & t).size.toDouble / t.size }
      per.sum / per.size
    }
    val curve = Seq(2, 4, 8, 22).map(np => np -> recallAt(np))
    info(curve.map { case (np, r) => s"nprobe=$np recall=$r" }.mkString(", "))
    curve.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(b >= a - 1e-12,
        s"filtered recall must be monotone in nprobe: $curve")
      case _ => ()
    }
    assert(curve.head._2 >= 0.44, s"measured 0.48 at nprobe=2: $curve")
    // 22 = nCellsFor(500): probing every cell makes the candidate set
    // the whole filtered corpus — recall must be exactly 1.0
    assert(curve.last._2 == 1.0, s"full probe must be exact: $curve")
  }

  test("adaptive depth: every query reaches its candidate target and buys back the lost recall") {
    val rows = Similarity.simFilteredAnnAdaptive(spark, dir).collect()
    assert(rows.nonEmpty)
    // the serve's own audit: the chosen depth collected >= target
    // filtered candidates for EVERY query
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cands") >= Similarity.adaptiveTarget,
        s"depth ${r.getAs[Int]("depth_used")} under-collected: $r")
    }
    // adaptivity is real: depths differ across queries on this corpus
    // (measured 3/5/3/3/4 at sf0.001)
    val depths = rows.map(_.getAs[Int]("depth_used")).toSet
    assert(depths.size > 1, s"every query chose the same depth: $depths")
    // labels hold
    val labels = Tables(spark, dir, "embeddings").select("vec_id", "label")
    assert(Similarity.simFilteredAnnAdaptive(spark, dir)
      .join(labels, "vec_id").collect()
      .forall(_.getAs[Int]("label") == Similarity.filteredAnnLabel))
    // recall vs the FILTERED exact top-5: measured 0.80 at sf0.001 —
    // up from 0.48 at the fixed unfiltered shipped depth (the penalty
    // the adaptive rule exists to cure); floor just below
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("vec_id").asc)
    val exact = graft.queries.Similarity.simCosineTopk(spark, dir, None, 1000000)
      .join(Tables(spark, dir, "embeddings")
        .filter(col("label") === Similarity.filteredAnnLabel)
        .select("vec_id"), Seq("vec_id"), "left_semi")
      .withColumn("r2", row_number().over(w)).filter(col("r2") <= 5)
      .collect().groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val got = rows.groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val per = exact.map { case (q, t) =>
      (got.getOrElse(q, Set.empty[Long]) & t).size.toDouble / t.size }
    val recall = per.sum / per.size
    info(s"adaptive filtered recall = $recall (fixed nprobe=2: 0.48)")
    assert(recall >= 0.76, s"measured 0.80; got $recall")
  }

  test("the label-id projection is a 2-column scan with the predicate pushed down") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scans = try {
      Similarity.simFilteredAnnIndexed(spark, dir)
        .queryExecution.executedPlan.collect {
          case f: FileSourceScanExec if f.relation.location.rootPaths
              .exists(_.toString.contains("embeddings")) &&
              f.metadata.getOrElse("PushedFilters", "")
                .contains(s"EqualTo(label,${Similarity.filteredAnnLabel})") =>
            f.requiredSchema.fieldNames.toSeq
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(scans.exists(_.toSet == Set("vec_id", "label")),
      s"no pruned pushed-down label scan found: $scans")
  }
}
