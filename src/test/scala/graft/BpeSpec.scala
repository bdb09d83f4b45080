package graft

import org.apache.spark.sql.functions._
import graft.queries.Text

/** BPE vocabulary induction (VERDICT r8 item 4): the merge SEQUENCE is
  * pinned on a planted corpus small enough to hand-compute — the Sennrich
  * 2016 shape (low/lower/newest/widest) — so the argmax tiebreak, the
  * every-adjacent-position counting convention, and the greedy
  * left-to-right rewrite are all load-bearing. A chained-merge corpus
  * pins the non-overlapping fold ("a a a a" merges to "aa aa", never
  * "aaa a"). The full-corpus runs are oracle-checked (tx_bpe_merges);
  * here the invariants that hold at any scale are asserted on sf0.001.
  */
class BpeSpec extends SparkSpec {

  private def plant(rows: Seq[String]): String = {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    rows.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "src1") }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("merge sequence on the Sennrich corpus: es, est, lo") {
    // vocab: low x5, lower x2, newest x6, widest x3. Hand-computed pair
    // counts: round 1 ties (e,s)=9 with (s,t)=9 -> lex tiebreak picks
    // (e,s); round 2 (es,t)=9 beats (w,e)=8; round 3 (l,o)=7 ties (o,w)=7
    // -> lex picks (l,o).
    val dir = plant(Seq(
      Seq.fill(5)("low").mkString(" "),
      Seq.fill(2)("lower").mkString(" "),
      Seq.fill(6)("newest").mkString(" "),
      Seq.fill(3)("widest").mkString(" ")))
    val got = Text.txBpeMerges(spark, dir, rounds = 3).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count")))
    assert(got.toSeq == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L)))
  }

  test("chained merges stay non-overlapping: aaaa -> aa aa") {
    // one word "aaaa" x3: round 1 merges (a,a) with count 9 (every
    // adjacent position: 3 per word); round 2 must see the REWRITTEN
    // sequences [aa, aa] and merge (aa, aa) with count 3 — a fold that
    // merged overlapping positions would produce [aaa, a] and round 2
    // would report (aaa, a) or a wrong count
    val dir = plant(Seq(Seq.fill(3)("aaaa").mkString(" ")))
    val got = Text.txBpeMerges(spark, dir, rounds = 2).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count")))
    assert(got.toSeq == Seq((1, "aa", 9L), (2, "aaaa", 3L)))
  }

  test("apply on the Sennrich corpus: hand-computed symbol counts and compression") {
    // After the 3 merges (es, est, lo): low -> [lo, w] (2 syms),
    // lower -> [lo, w, e, r] (4), newest -> [n, e, w, est] (4),
    // widest -> [w, i, d, est] (4). Weighted: n_tokens = 16,
    // n_chars = 5*3 + 2*5 + 6*6 + 3*6 = 79,
    // n_symbols = 5*2 + 2*4 + 6*4 + 3*4 = 54.
    val dir = plant(Seq(
      Seq.fill(5)("low").mkString(" "),
      Seq.fill(2)("lower").mkString(" "),
      Seq.fill(6)("newest").mkString(" "),
      Seq.fill(3)("widest").mkString(" ")))
    val rows = Text.txBpeApply(spark, dir, rounds = 3).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_tokens") == 16L)
    assert(r.getAs[Long]("n_chars") == 79L)
    assert(r.getAs[Long]("n_symbols") == 54L)
    assert(r.getAs[Double]("compression") == 79.0 / 54.0)
  }

  test("full-corpus run: six rounds, positive weighted counts, merged = left||right") {
    val rows = Text.txBpeMerges(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getAs[Int]("round")).toSeq == (1 to 6))
    rows.foreach { r =>
      assert(r.getAs[Long]("pair_count") > 0)
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("left_sym") + r.getAs[String]("right_sym"))
    }
  }

  test("standing tokenizer equals the train-per-call encode report") {
    val dir = "/root/testdata/sf0.001"
    val perCall = Text.txBpeApply(spark, dir).collect()
    val indexed = Text.txBpeApplyIndexed(spark, dir).collect()
    assert(indexed.toSeq == perCall.toSeq,
      "deterministic training: the persisted vocabulary must reproduce " +
        "the train-per-call report row for row")
  }

  test("streaming encode with the standing vocabulary equals batch per doc") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamingOps
    val dir = "/root/testdata/sf0.001"
    val vocab = Text.bpeVocabSymCounts(spark, dir)
    assert(vocab.nonEmpty, "vocab collected from the standing index")
    assert(vocab.exists { case (t, n) => n < t.length },
      "at least one vocab token must have merged below its char length")
    val streamDir = java.nio.file.Files.createTempDirectory("graft-bpe-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      streamDir.resolve("documents.parquet"))
    val q = StreamingOps.bpeEncodedDocs(
        StreamingOps.readDocumentsStream(spark, streamDir.toString), vocab)
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val streamed = spark.table("bpe_stream").orderBy("doc_id").collect()
    val batch = StreamingOps.bpeEncodedDocs(
        Tables(spark, dir, "documents"), vocab)
      .orderBy("doc_id").collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    assert(streamed.zip(batch).forall { case (a, b) => a == b },
      "per-doc streamed encode must equal the batch encode")
    // the encode is real: merges happened, so some doc's symbol count is
    // strictly under its char count
    assert(streamed.exists(r =>
      r.getAs[Long]("n_symbols") < r.getAs[Long]("n_chars")),
      "trained merges must compress at least one document")
    // per-language totals agree with the oracle'd corpus report
    val streamedByLang = spark.table("bpe_stream").groupBy("lang")
      .agg(sum("n_chars").as("c"), sum("n_symbols").as("s")).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("c"), r.getAs[Long]("s"))).toMap
    Text.txBpeApplyIndexed(spark, dir).collect().foreach { r =>
      val (c, s2) = streamedByLang(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_chars") == c && r.getAs[Long]("n_symbols") == s2,
        s"${r.getAs[String]("lang")}: streamed totals diverge from the report")
    }
  }
}
