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
}
