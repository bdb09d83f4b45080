package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{GraftExtensions, VectorFunctions}

/** The codegen'd float_dot expression must agree bit-for-bit with the
  * interpreted higher-order-function fold, handle nulls, and register
  * through both the lazy path and SparkSessionExtensions.
  */
class VectorExpressionsSpec extends SparkSpec {

  test("float_dot equals the interpreted fold bit-for-bit") {
    VectorFunctions.ensureRegistered(spark)
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val a = emb.as("a").filter("vec_id < 20")
    val b = emb.as("b").filter("vec_id >= 20 AND vec_id < 40")
    val pairs = a.crossJoin(b)
    val both = pairs.select(
      expr("float_dot(a.embedding, b.embedding)").as("fast"),
      expr("aggregate(sequence(0, 63), 0D, (acc, i) -> acc + CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))")
        .as("fold")).collect()
    assert(both.length == 400)
    assert(both.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("float_dot is null-intolerant: null input gives null, not garbage") {
    VectorFunctions.ensureRegistered(spark)
    val out = spark.sql(
      "SELECT float_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
      .collect().head
    assert(out.isNullAt(0))
  }

  test("float_dot yields null on length mismatch and null elements, never a partial sum") {
    VectorFunctions.ensureRegistered(spark)
    val rows = spark.sql(
      """SELECT
        |  float_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(1 AS FLOAT))) AS mismatch,
        |  float_dot(array(CAST(1 AS FLOAT), CAST(NULL AS FLOAT)), array(CAST(1 AS FLOAT), CAST(1 AS FLOAT))) AS nullelem
        |""".stripMargin).collect().head
    assert(rows.isNullAt(0), "length mismatch must be NULL")
    assert(rows.isNullAt(1), "null element must be NULL")
  }

  test("GraftExtensions registers float_dot at session build") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val v = s2.sql(
        "SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT)))")
        .collect().head.getDouble(0)
      assert(v == 4.0)
    } finally {
      // getOrCreate may return the shared suite session; only the config
      // differs. Do not stop it — other suites share the SparkContext.
    }
  }
}
