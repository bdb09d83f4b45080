package graft

import org.apache.spark.sql.functions._
import graft.queries.Text

/** Release-build pins: allocations sum to the budget to the token,
  * every source's selection fits its allocation and is greedily maximal
  * (the next hash-ordered doc would overflow), and the shard manifest
  * partitions the selection.
  */
class ReleaseSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("allocations exhaust the budget; selections fit and are maximal") {
    val rows = Text.pipelineRelease(spark, dir).collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    // per-source allocation is constant across its shard rows
    val alloc = bySrc.map { case (s, rs) =>
      val as = rs.map(_.getAs[Long]("allocated_tokens")).distinct
      assert(as.length == 1, s"$s: inconsistent allocation")
      s -> as.head
    }
    val caps = bySrc.map { case (s, rs) =>
      s -> rs.map(_.getAs[Long]("cap_tokens")).distinct.head
    }
    // waterfill identity: allocations sum EXACTLY to half the cap mass
    assert(alloc.values.sum == caps.values.sum / 2,
      "allocations do not exhaust the budget")
    // recompute the per-source greedy frontier from the survivors
    val surv = Text.prepareCorpusSurvivors(spark, dir)
      .select(col("source"), col("doc_id"), col("n2"),
        expr("CAST(conv(substring(h2, 1, 15), 16, 10) AS BIGINT)").as("sk"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n2"), r.getAs[Long]("sk")))
    bySrc.foreach { case (s, rs) =>
      val selected = rs.filter(_.getAs[Long]("shard") >= 0)
        .map(_.getAs[Long]("tokens")).sum
      assert(selected <= alloc(s), s"$s selection overflows its budget")
      // maximality: the first unselected doc in hash order would overflow
      val ordered = surv.filter(_._1 == s).sortBy(t => (t._4, t._2))
      val cums = ordered.scanLeft(0L)(_ + _._3).tail
      val kept = cums.takeWhile(_ <= alloc(s))
      assert(kept.lastOption.getOrElse(0L) == selected,
        s"$s: served token sum disagrees with the hand greedy")
      if (kept.length < ordered.length)
        assert(cums(kept.length) > alloc(s),
          s"$s: selection is not maximal")
      // doc-count conservation against the hand greedy
      val nDocs = rs.filter(_.getAs[Long]("shard") >= 0)
        .map(_.getAs[Long]("n_docs")).sum
      assert(nDocs == kept.length.toLong, s"$s doc count")
    }
    // shard ids are the documented range
    rows.foreach { r =>
      val sh = r.getAs[Long]("shard")
      assert(sh == -1L || (sh >= 0 && sh < 4), r.toString)
    }
  }

  test("a budget-starved source surfaces as a zero-row shard -1 witness") {
    import spark.implicits._
    // srcA holds nearly all mass; srcB's single doc is bigger than the
    // allocation water level, so its selection is empty — the branch
    // the natural corpus never exercises
    // caps: srcA 5x40 = 200, srcB 150; budget = 175, waterfill gives
    // srcA 88 (selects two 40-token docs), srcB 87 (< its only doc)
    val surv = ((1L to 5L).map(i =>
      (i, "srcA", 40L, f"aa${i}%02d0000000000000000000000000000", i * 11L)) :+
      ((9L, "srcB", 150L, "cc00cc00cc00cc00cc00cc00cc00cc00", 99L)))
      .toDF("doc_id", "source", "n2", "h2", "sk")
    val out = Text.releaseOver(surv, 4).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("shard"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("tokens"),
        r.getAs[Long]("allocated_tokens")))
    // budget = 350 div 2 = 175; srcA (cap 200) and srcB (cap 150) split
    // by the waterfill; srcB's water level < 150 leaves its 150-token
    // doc unselected
    val b = out.filter(_._1 == "srcB")
    assert(b.length == 1 && b.head._2 == -1L && b.head._3 == 0L &&
      b.head._4 == 0L, s"srcB rows: ${b.toSeq}")
    assert(b.head._5 < 150L, "srcB must be budget-starved in this plant")
    val a = out.filter(_._1 == "srcA")
    assert(a.forall(_._2 >= 0) && a.map(_._3).sum >= 1,
      s"srcA rows: ${a.toSeq}")
  }
}
