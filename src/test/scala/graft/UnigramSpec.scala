package graft

import org.apache.spark.sql.functions._
import graft.queries.Text

/** Unigram-LM tokenizer (VERDICT r15 item 7): a planted-corpus hand
  * trace of the whole-bit hard-EM trainer — seed frequencies, the
  * packed-integer Viterbi DP (fewest pieces first, then largest
  * whole-bit score, ties to the shortest piece), usage-ranked pruning —
  * plus corpus-level coverage identities.
  */
class UnigramSpec extends SparkSpec {

  test("planted corpus: hand-traced seed, segmentation and prune") {
    import spark.implicits._
    // toks {aaa:8, aab:4, bb:2}. Substring masses: a=32, b=8, aa=20,
    // ab=4, aaa=8, aab=4, bb=2 -> whole-bit scores 5/3/4/2/3/2/1.
    // Viterbi (the piece-count penalty dominates): every token
    // segments to its single longest piece (aaa, aab, bb). Round 1:
    // usage {aaa:8, aab:4, bb:2, aa:0, ab:0}; 5 multi pieces ->
    // ceil(20%) = 1 pruned = "aa" (usage 0, piece ASC). Round 2: same
    // segmentation; 4 multi -> 1 pruned = "ab". Final vocabulary
    // {a:5, b:3, aaa:3, aab:2, bb:1} with the one-piece segmentations.
    val gtok = Seq(("aaa", 8L), ("aab", 4L), ("bb", 2L)).toDF("tok", "c")
    val (vocab, seg) = Text.uniTrainOver(spark, gtok)
    val v = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("a" -> 5L, "b" -> 3L, "aaa" -> 3L, "aab" -> 2L,
      "bb" -> 1L))
    val pieces = seg.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(pieces("aaa") == Seq("aaa"))
    assert(pieces("aab") == Seq("aab"))
    assert(pieces("bb") == Seq("bb"))
  }

  test("planted corpus: the DP beats the greedy longest-match") {
    import spark.implicits._
    // single token "abab": masses a=2, b=2, ab=2, ba=1, aba=1, bab=1
    // -> bits 1/1/1/0/0/0. Greedy longest-match would take "aba" then
    // "b" (2 pieces, score 0+1); the DP also finds 2 pieces but the
    // max score split [ab, ab] (1+1) — pinned here. Pruning then drops
    // "aba" (round 1) and "ba" (round 2), both usage 0.
    val gtok = Seq(("abab", 1L)).toDF("tok", "c")
    val (vocab, seg) = Text.uniTrainOver(spark, gtok)
    val p = seg.collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(p("abab") == Seq("ab", "ab"))
    val vs = vocab.collect().map(_.getString(0)).toSet
    assert(vs == Set("a", "b", "ab", "bab"))
  }

  test("corpus: coverage identity and report sanity") {
    val dir = "/root/testdata/sf0.001"
    val train = Text.txUnigramTrain(spark, dir).collect()
    assert(train.nonEmpty)
    // single chars are never pruned: every char piece survives
    assert(train.count(_.getAs[Int]("piece_len") == 1) >= 2)
    assert(train.forall(_.getAs[Long]("usage") >= 0L))
    val apply = Text.txUnigramApply(spark, dir).collect()
    assert(apply.nonEmpty)
    apply.foreach { r =>
      assert(r.getAs[Long]("n_pieces") <= r.getAs[Long]("n_chars"))
      assert(r.getAs[Double]("compression") >= 1.0)
    }
  }
}
