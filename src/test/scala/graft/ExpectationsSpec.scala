package graft

import graft.queries.Text

/** Data-contract expectations + dead-letter quarantine pins: the per-rule
  * audit and the physical router can never disagree (shared fail-predicate
  * definition, asserted here on real output), every rule actually fires
  * AND actually passes on the planted landing batch (both branches
  * exercised), multi-violation rows carry every tag, and clean rows never
  * land in quarantine. Completeness vs first principles is the two ORACLE
  * rows (DuckDB re-derives the planted carve + rules from scratch).
  */
class ExpectationsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("audit rollup ≡ physical quarantine table (count and id-XOR)") {
    val audit = Text.pipelineExpectations(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val q = Text.pipelineQuarantine(spark, dir).collect()
    val roll = audit("_quarantined")
    assert(roll.getAs[Long]("n_fail") == q.length,
      "rollup count != dead-letter table cardinality")
    val xor = q.map(_.getAs[Long]("doc_id")).foldLeft(0L)(_ ^ _)
    assert(roll.getAs[Long]("fail_id_xor") == xor,
      "rollup id-XOR != dead-letter table content")
  }

  test("every rule fires and passes on the planted batch; tags are complete") {
    val audit = Text.pipelineExpectations(spark, dir).collect()
      .filter(_.getString(0) != "_quarantined")
    assert(audit.length == 3)
    audit.foreach { r =>
      val (n, f) = (r.getAs[Long]("n_checked"), r.getAs[Long]("n_fail"))
      assert(f > 0, s"rule ${r.getString(0)} never fired — branch untested")
      assert(f < n, s"rule ${r.getString(0)} failed every row")
    }
    val q = Text.pipelineQuarantine(spark, dir).collect()
    // blanked text violates BOTH nonempty_text and chars_consistent:
    // the multi-violation row must exist and carry both tags in order
    val blanked = q.filter(_.getAs[Long]("doc_id") % Text.expBlankMod
      == Text.expBlankRem)
    assert(blanked.nonEmpty)
    blanked.foreach { r =>
      val v = r.getAs[String]("violations")
      assert(v.contains("chars_consistent") && v.contains("nonempty_text"),
        s"doc ${r.getAs[Long]("doc_id")}: incomplete tags '$v'")
    }
    // rule-name ordering inside the tag list (deterministic triage column)
    q.foreach { r =>
      val parts = r.getAs[String]("violations").split(",").toSeq
      assert(parts == parts.sorted, s"tags not in rule order: $parts")
    }
  }

  test("clean rows never reach the dead-letter table") {
    val q = Text.pipelineQuarantine(spark, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    q.foreach { id =>
      val planted = id % Text.expBlankMod == Text.expBlankRem ||
        id % Text.expLangMod == Text.expLangRem ||
        id % Text.expCharsMod == Text.expCharsRem
      assert(planted, s"clean doc $id was quarantined")
    }
  }
}
