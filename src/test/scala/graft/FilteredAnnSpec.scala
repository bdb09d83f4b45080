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
