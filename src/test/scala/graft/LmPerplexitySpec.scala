package graft

import org.apache.spark.sql.functions._

import graft.queries.Text

/** Planted-corpus physics for the CCNet-style LM perplexity buckets
  * ([[graft.queries.Text.txLmPerplexity]]): documents built from the
  * reference corpus's own bigrams must score LOW surrogate perplexity
  * and land in the head tercile; documents of never-seen tokens must
  * score HIGH and land in the tail — the separation the whole-bit
  * integer log surrogate has to preserve for the filter to mean
  * anything.
  */
class LmPerplexitySpec extends SparkSpec {

  test("in-domain docs land head, out-of-domain docs land tail") {
    import spark.implicits._
    val refPhrase = "the cat sat on the mat and the dog sat on the rug"
    // reference carve (src0): many repetitions of one phrase family — a
    // tight LM with heavy bigram counts
    val ref = (0L until 30L).map(i => (1000L + i, "en", "src0", refPhrase))
    // crawl: 3 in-domain docs (the reference phrase), 3 mixed, 3 of
    // never-seen tokens (uniform garbage — every bigram unseen)
    val inDomain = (0L until 3L).map(i => (i, "en", "src1", refPhrase))
    val mixed = (10L until 13L).map(i =>
      (i, "en", "src1", "the cat sat on zzz qqq www eee rrr ttt yyy uuu"))
    val garbage = (20L until 23L).map(i =>
      (i, "en", "src1", s"xx$i yy$i zz$i aa$i bb$i cc$i dd$i ee$i ff$i gg$i hh$i ii$i"))
    val docs = (ref ++ inDomain ++ mixed ++ garbage)
      .toDF("doc_id", "lang", "source", "text")
    val buckets = Text.lmPerplexityOver(spark, docs).collect()
    val byBucket = buckets.map(r =>
      r.getAs[String]("bucket") -> r).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"),
      s"expected all three terciles, got ${byBucket.keySet}")
    // 9 crawl docs → 3 per tercile; id_sum separates the plants exactly
    assert(byBucket("head").getAs[Long]("n_docs") == 3)
    assert(byBucket("head").getAs[Long]("id_sum") == 0L + 1L + 2L,
      "the in-domain docs must fill the head tercile")
    assert(byBucket("tail").getAs[Long]("id_sum") == 20L + 21L + 22L,
      "the never-seen-token docs must fill the tail tercile")
    // and the surrogate itself must order the groups strictly
    assert(byBucket("head").getAs[Long]("max_ppm") <
      byBucket("middle").getAs[Long]("min_ppm"))
    assert(byBucket("middle").getAs[Long]("max_ppm") <
      byBucket("tail").getAs[Long]("min_ppm"))
  }

  test("streaming scorer equals batch, and re-bucketing reproduces the report") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamingOps
    val sfDir = "/root/testdata/sf0.001"
    val (nb, nc) = Text.lmStats(spark, sfDir)
    assert(nb.size == Text.lmBuckets && nc.size == Text.lmBuckets)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-lm-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      streamDir.resolve("documents.parquet"))
    val q = StreamingOps.lmScoredDocs(
        StreamingOps.readDocumentsStream(spark, streamDir.toString), nb, nc)
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val streamed = spark.table("lm_stream").orderBy("doc_id").collect()
    val batch = StreamingOps.lmScoredDocs(
        Tables(spark, sfDir, "documents"), nb, nc)
      .orderBy("doc_id").collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    assert(streamed.zip(batch).forall { case (a, b) => a == b },
      "per-doc streamed LM scores must equal the batch scores bit for bit")
    // the serving-side tercile assignment over the streamed scores must
    // reproduce the batch report's bucket counts exactly
    val report = Text.txLmPerplexity(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("bucket")) ->
        r.getAs[Long]("n_docs")).toMap
    val rebucketed = streamed
      .groupBy(_.getAs[String]("lang"))
      .toSeq
      .flatMap { case (lang, rows) =>
        val sorted = rows.toSeq
          .sortBy(r => (r.getAs[Long]("ppm"), r.getAs[Long]("doc_id")))
        val n = sorted.length
        sorted.zipWithIndex.map { case (_, i) =>
          val rn = i + 1L
          val b = if (rn * 3 <= n) "head"
            else if (rn * 3 <= n * 2L) "middle" else "tail"
          (lang, b)
        }
      }
      .groupBy(x => x).view.mapValues(_.size.toLong).toMap
    report.foreach { case (k, v) =>
      assert(rebucketed.getOrElse(k, 0L) == v,
        s"bucket count mismatch for $k: stream ${rebucketed.get(k)} vs batch $v")
    }
  }

  test("ccnet composition ties back to the standalone operators") {
    val sfDir = "/root/testdata/sf0.001"
    val ccnet = Text.pipelineCcnet(spark, sfDir).collect()
    assert(ccnet.nonEmpty)
    // stage totals must conserve the LM stage's scored-doc count
    val lmTotal = Text.txLmPerplexity(spark, sfDir).collect()
      .map(_.getAs[Long]("n_docs")).sum
    assert(ccnet.map(_.getAs[Long]("n_docs")).sum == lmTotal,
      "composition must cover exactly the LM-scored crawl domain")
    // the dup count equals the domain's direct over-count of distinct texts
    val domain = Tables(spark, sfDir, "documents")
      .filter(col("source") =!= "src0" &&
        size(split(col("text"), " ")) >= 2)
    val nDocs = domain.count()
    val nTexts = domain.select("text").distinct().count()
    assert(ccnet.map(_.getAs[Long]("n_dup")).sum == nDocs - nTexts,
      "keep-first dup count must equal docs minus distinct texts")
    // keep rule internal consistency: kept <= non-dup, tail keeps none
    ccnet.foreach { r =>
      val kept = r.getAs[Long]("n_kept")
      assert(kept <= r.getAs[Long]("n_docs") - r.getAs[Long]("n_dup"))
      if (r.getAs[String]("bucket") == "tail")
        assert(kept == 0L, "CCNet's default drops the tail tercile")
    }
  }

  test("indexed form serves the persisted model and equals train-per-call") {
    val sfDir = "/root/testdata/sf0.001"
    val indexed = Text.txLmPerplexityIndexed(spark, sfDir).collect()
    val trained = Text.txLmPerplexity(spark, sfDir).collect()
    assert(indexed.toSeq == trained.toSeq,
      "persisted-histogram scoring must equal train-per-call row for row")
    // served, not rebuilt (the AggRefreshSpec mtime discipline)
    val base = Text.ensureLmIndex(spark, sfDir)
    val marker = new org.apache.hadoop.fs.Path(s"$base/stats/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t0 = fs.getFileStatus(marker).getModificationTime
    Text.txLmPerplexityIndexed(spark, sfDir).collect()
    Text.txLmPerplexityIndexed(spark, sfDir).collect()
    assert(fs.getFileStatus(marker).getModificationTime == t0,
      "two indexed scores must not rewrite the standing model")
  }

  test("histogram refresh equals the full retrain bit-for-bit") {
    val sfDir = "/root/testdata/sf0.001"
    val merged = Text.txLmRefresh(spark, sfDir).collect()
    assert(merged.length == Text.lmBuckets)
    val (nb, nc) = Text.lmStats(spark, sfDir) // the full retrain
    merged.foreach { r =>
      val j = r.getAs[Int]("j")
      assert(r.getAs[Long]("nb") == nb(j) && r.getAs[Long]("nc") == nc(j),
        s"bucket $j: merged histogram diverged from the retrain")
      assert(r.getAs[Long]("nb_base") + r.getAs[Long]("nb_delta") ==
        r.getAs[Long]("nb"))
    }
    assert(merged.map(_.getAs[Long]("nb_delta")).sum > 0,
      "the delta carve must contribute real counts")
  }

  test("tercile sizes and coverage on the driver corpus") {
    val rows = Text.txLmPerplexity(spark, "/root/testdata/sf0.001").collect()
    val perLang = rows.groupBy(_.getAs[String]("lang"))
    assert(perLang.nonEmpty)
    perLang.foreach { case (lang, rs) =>
      val n = rs.map(_.getAs[Long]("n_docs")).sum
      val byB = rs.map(r => r.getAs[String]("bucket") ->
        r.getAs[Long]("n_docs")).toMap
      // integer tercile arithmetic: sizes differ by at most 1
      assert(byB.values.max - byB.values.min <= 1,
        s"$lang terciles unbalanced: $byB over $n docs")
      // head is the LOW-perplexity (most reference-like) end
      val head = rs.find(_.getAs[String]("bucket") == "head").get
      val tail = rs.find(_.getAs[String]("bucket") == "tail").get
      assert(head.getAs[Long]("min_ppm") <= tail.getAs[Long]("min_ppm"))
      assert(head.getAs[Long]("max_ppm") <= tail.getAs[Long]("max_ppm"))
    }
  }
}
