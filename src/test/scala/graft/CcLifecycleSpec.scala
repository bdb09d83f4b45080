package graft

import org.apache.spark.sql.functions._

import graft.queries.Text

/** Cluster-closure lifecycle (r12 verdict gap #1): the write-back serves
  * the real merged state without recomputing, and the component-local
  * delete reproduces the full-recompute semantics — including the SPLIT
  * case star(base) cannot express.
  */
class CcLifecycleSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"

  test("cc refresh: served labels equal the full recompute and never touch the index tables") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val served = Text.ddCcRefresh(spark, sf001)
    val rows = served.collect().toSeq
    // refresh ≡ rebuild: the persisted write-back must serve exactly the
    // clusters a from-scratch full-corpus closure computes
    assert(rows == Text.ddDupClusters(spark, sf001).collect().toSeq,
      "refreshed standing labels drifted from the full recompute")
    // serve-not-rebuilt: every file scan in the served plan reads the
    // cc_ref overlay or the documents table — no band/shingle tables,
    // no cc_base, no contraction re-run
    var badScans = List.empty[String]
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.foreach { rp =>
            val s = rp.toString
            if (!s.contains("cc_ref") && !s.contains("documents"))
              badScans ::= s
          }
        case _ => ()
      }
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: QueryStageExec => walk(s.plan)
        case other => other.children.foreach(walk)
      }
    }
    walk(served.queryExecution.executedPlan)
    assert(badScans.isEmpty, s"refresh serve scanned: $badScans")
    // absorption: the refreshed labels are a fixed point — closing
    // star(refreshed) changes nothing, so the next batch's base is
    // exactly this state (no re-merging of batch 1's edges)
    val base = Text.ensureCcRefreshed(spark, sf001)
    val labels = spark.read.parquet(s"$base/labels")
    val reclosed = ConnectedComponents.run(
      labels.select(col("id").as("a"), col("component").as("b")), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = labels.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("component")).toMap
    assert(reclosed == direct, "refreshed labels are not a fixed point")
  }

  test("cc delete: a tombstoned cut vertex SPLITS its component") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ccd").toString
    // seed-39 sliding-window chain (probed offline against the md5 band
    // construction): five 14-token windows shifted by 3 over a 26-token
    // stream — adjacent Jaccard = 9/15 = 0.6 (confirmed, and every
    // adjacent pair deterministically collides in ≥1 minhash band),
    // skip-one Jaccard = 6/18 = 0.33 (rejected). Ids: all in the base
    // carve (% 5 ≠ 0); only the MIDDLE doc (id 3, 3 % 17 = 3, lang en)
    // is tombstoned by fuzzyDeadCond.
    val toks = (0 until 26).map(k => s"w39_$k")
    val ids = Seq(1L, 2L, 3L, 4L, 6L)
    val docsDf = ids.zipWithIndex.map { case (id, i) =>
      (id, toks.slice(3 * i, 3 * i + 14).mkString(" "))
    }.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docsDf.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // before the delete: one chain component rooted at 1, size 5
    val before = Text.ddDupClusters(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component"),
        r.getAs[Long]("cluster_size"))).toSet
    assert(before == ids.map(id => (id, 1L, 5L)).toSet,
      s"planted chain should close into one size-5 component: $before")
    // after: removing the bridge doc 3 must split {1,2} from {4,6} —
    // the case the star-forest labels alone cannot reconstruct
    val after = Text.ddCcDelete(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component"),
        r.getAs[Long]("cluster_size"))).toSet
    assert(after == Set((1L, 1L, 2L), (2L, 1L, 2L), (4L, 4L, 2L), (6L, 4L, 2L)),
      s"bridge removal must split the chain into two 2-clusters: $after")
  }

  test("cc delete: untouched components keep their labels verbatim (component-local recompute)") {
    // On the natural corpus the delete result must agree with a full
    // recompute over survivors (the oracle re-proves this in DuckDB; here
    // the same law via the engine's own full path), AND every component
    // with no tombstoned member must appear with identical membership —
    // the part the component-local form copies without recompute.
    val survivors = Text.ddCcDelete(spark, sf001).collect()
      .map(r => (r.getAs[Long]("component"), r.getAs[Long]("doc_id")))
    val full = Text.ddDupClusters(spark, sf001)
    val baseCc = full.filter(
        pmod(col("doc_id"), lit(Text.incrementalDeltaMod)) =!= 0)
    // recompute-from-scratch comparison frame: dup clusters over the
    // base carve minus the dead carve, via the public full path on a
    // filtered copy of the corpus
    val tmp = java.nio.file.Files.createTempDirectory("graft-ccd2").toString
    Tables(spark, sf001, "documents")
      .filter(pmod(col("doc_id"), lit(Text.incrementalDeltaMod)) =!= 0)
      .filter(!((col("lang") === "zh" && pmod(col("doc_id"), lit(2)) === 1) ||
        (col("lang") =!= "zh" && pmod(col("doc_id"), lit(17)) === 3)))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rebuilt = Text.ddDupClusters(spark, tmp).collect()
      .map(r => (r.getAs[Long]("component"), r.getAs[Long]("doc_id")))
    assert(survivors.toSeq == rebuilt.toSeq,
      "component-local delete drifted from the survivor rebuild")
    assert(baseCc.collect().nonEmpty)
  }
}
