package graft

import org.apache.spark.sql.functions._
import graft.queries.Similarity

/** Standing ground-truth tables for the lifecycle-quality matrix
  * (VERDICT r15 item 4): the persisted truths must equal the exact
  * top-5 recomputed from first principles — build-once must never mean
  * drift-once.
  */
class IrTruthSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("standing full truth equals the live exact top-5") {
    val base = Similarity.ensureIrTruth(spark, dir)
    val standing = asSet(spark.read.parquet(s"$base/full"))
    val live = asSet(Similarity.simCosineTopk(spark, dir)
      .filter(col("rnk") <= 5))
    assert(standing == live && standing.nonEmpty)
  }

  test("standing flat_del truth equals an independent brute-force rerank") {
    // independent derivation (not the cosineTopkLive text): cosine over
    // the id%4 live carve, window top-5 — same tie rule (cosine DESC,
    // vec_id ASC)
    val base = Similarity.ensureIrTruth(spark, dir)
    val standing = asSet(spark.read.parquet(s"$base/flat_del"))
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("norm", expr("sqrt(float_dot(embedding, embedding))"))
    val live = emb.filter(
      !(col("vec_id") % Similarity.pqDelMod === Similarity.pqDelRem))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("norm").as("qnorm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cosine").desc, col("vec_id").asc)
    val expect = asSet(live.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cosine",
        expr("float_dot(qvec, embedding)") / (col("qnorm") * col("norm")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5))
    assert(standing == expect && standing.nonEmpty)
  }
}
