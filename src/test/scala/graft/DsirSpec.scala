package graft

import org.apache.spark.sql.functions._
import graft.queries.Text

/** DSIR-shaped importance selection (Xie et al. 2023): the planted
  * corpus below was offline-modeled with the exact md5 bucket rule and
  * the integer probability-difference score (the ANN-params discipline),
  * so every expected sign is a precomputed fact: target docs score
  * 2176/3670/2330/1484, the target-LIKE raw doc (id 2 — the doc DSIR
  * exists to find) scores +164 and is selected, and every noise doc
  * scores ≤ −1414 and is rejected.
  */
class DsirSpec extends SparkSpec {

  test("planted corpus: target-like raw doc selected, noise rejected") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    Seq(
      (0L, "q1 q2 q3 quality text h1", "en", "src0"),
      (3L, "q2 q3 q4 quality text h2", "en", "src0"),
      (6L, "q3 q4 q5 quality text h3", "en", "src0"),
      (9L, "q4 q5 q6 quality text h4", "en", "src0"),
      (2L, "q5 q6 q1 quality text h5", "en", "src1"),
      (30L, "n1 n2 n3 noisy data z1", "en", "src1"),
      (33L, "n2 n3 n4 noisy data z2", "en", "src1"),
      (36L, "n3 n4 n5 noisy data z3", "en", "src1"),
      (39L, "n4 n5 n6 noisy data z4", "en", "src1"),
      (42L, "n5 n6 n1 noisy data z5", "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Text.txDsirSelect(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val t = rows("src0")
    assert(t.getAs[Long]("n_docs") == 4 && t.getAs[Long]("n_selected") == 4,
      "every target doc sits where the target distribution dominates")
    assert(t.getAs[Long]("min_score") == 1484L &&
      t.getAs[Long]("max_score") == 3670L,
      s"offline-modeled target score extrema: $t")
    val r = rows("src1")
    assert(r.getAs[Long]("n_docs") == 6 && r.getAs[Long]("n_selected") == 1,
      "exactly the target-like raw doc is selected")
    assert(r.getAs[Long]("sel_id_sum") == 2L,
      "the selected raw doc is id 2 — the doc DSIR exists to find")
    assert(r.getAs[Long]("max_score") == 164L &&
      r.getAs[Long]("min_score") == -3556L,
      s"offline-modeled raw score extrema: $r")
  }

  test("streaming scorer equals batch scoring with the standing distributions") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamingOps
    val sfDir = "/root/testdata/sf0.001"
    val (nt, nr, tN, rN) = Text.dsirStats(spark, sfDir)
    assert(nt.size == 64 && nr.size == 64 && tN > 0 && rN > 0)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-dsir-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      streamDir.resolve("documents.parquet"))
    val q = StreamingOps.dsirSelectedDocs(
        StreamingOps.readDocumentsStream(spark, streamDir.toString),
        nt, nr, tN, rN)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val streamed = spark.table("dsir_stream").orderBy("doc_id").collect()
    val batch = StreamingOps.dsirSelectedDocs(
        Tables(spark, sfDir, "documents"), nt, nr, tN, rN)
      .orderBy("doc_id").collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    assert(streamed.zip(batch).forall { case (a, b) => a == b },
      "per-doc streamed scores must equal the batch scores bit for bit")
    // the admitted set agrees with the batch report's per-group counts
    val report = Text.txDsirSelect(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        r.getAs[Long]("n_selected")).toMap
    val fromStream = streamed.filter(_.getAs[Boolean]("selected"))
      .groupBy(r => (r.getAs[String]("lang"), r.getAs[String]("source")))
      .view.mapValues(_.length.toLong).toMap
    report.foreach { case (k, v) =>
      assert(fromStream.getOrElse(k, 0L) == v,
        s"selected count mismatch for $k: stream ${fromStream.get(k)} vs batch $v")
    }
  }

  test("natural corpus: report is internally consistent") {
    val rows = Text.txDsirSelect(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val sel = r.getAs[Long]("n_selected")
      assert(sel >= 0 && sel <= n)
      assert(r.getAs[Long]("min_score") <= r.getAs[Long]("max_score"))
      // score > 0 selected iff max_score > 0 for a group with selections
      if (sel > 0) assert(r.getAs[Long]("max_score") > 0)
      else assert(r.getAs[Long]("max_score") <= 0 ||
        r.isNullAt(r.fieldIndex("sel_id_sum")) == (sel == 0))
    }
    // every doc lands in exactly one (lang, source) group
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").count()
    assert(total == docs, "feature filter must keep every document")
  }
}
