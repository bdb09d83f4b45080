package graft

import org.apache.spark.sql.functions._
import graft.queries.Similarity

/** Generational compaction of the kNN-graph family (VERDICT r14 item 2)
  * — the sim_ivf_compact contract applied to graph adjacency: the gen-2
  * serve must be bit-equal to the masked merge-on-read walk, its hop
  * plan must carry no tombstone anti-join and read the gen-2 table, and
  * the physical fold must hold exactly the merged view (degree + id-XOR
  * audit, inserted-vertex accounting, no tombstoned vertex anywhere).
  */
class GraphCompactSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("compacted serve ≡ masked merge-on-read serve bit-for-bit") {
    val masked = Similarity.simGraphSearchMutatedMasked(spark, dir)
      .collect().toSeq
    val compacted = Similarity.simGraphSearchCompacted(spark, dir)
      .collect().toSeq
    assert(masked.nonEmpty)
    assert(compacted == masked,
      "gen-2 serve diverged from the masked merge-on-read walk")
  }

  test("gen-2 hop plan: no anti-join, no per-call walk, reads gen-2") {
    // the un-checkpointed hop (the pagerank-pin rule: the served walk's
    // checkpoints hide every hop's plan, so pin the factored hop)
    val hop = Similarity.gen2WalkHop(spark, dir)
    val plan = hop.queryExecution.executedPlan.toString
    assert(!plan.contains("LeftAnti"), "gen-2 hop still anti-joins a mask")
    assert(!plan.contains("knn_graph_del"),
      "gen-2 hop still reads the delete overlay")
    assert(plan.contains("knn_graph_gen2"), "gen-2 hop does not read gen-2")
    // the mask the rewrite retires IS an anti-join in the merge-on-read
    // view's plan — proves the pin above tests a real difference
    val maskedPlan = Similarity.mergedMutatedEdges(spark, dir)
      .queryExecution.executedPlan.toString
    assert(maskedPlan.contains("LeftAnti"),
      "the masked view lost its tombstone anti-join — pin is vacuous")
  }

  test("physical fold: no tombstoned vertex, inserted links bidirectional") {
    val g2 = Similarity.ensureKnnGraphGen2Index(spark, dir)
    val edges = spark.read.parquet(s"$g2/edges")
    // no tombstoned endpoint anywhere (insert links to dead dropped;
    // repaired overlay is live-only by construction)
    val deadEnd = edges.filter(
      (col("v") >= 0 && col("v") % Similarity.graphDelMod ===
        Similarity.graphDelRem) ||
      (col("u") >= 0 && col("u") % Similarity.graphDelMod ===
        Similarity.graphDelRem)).count()
    assert(deadEnd == 0L, s"$deadEnd edges touch a tombstoned vertex")
    // every insert link present in both directions (the HNSW connect)
    val ins = edges.filter(col("v") < 0 || col("u") < 0)
    val missing = ins
      .join(ins.select(col("u").as("v"), col("v").as("u")),
        Seq("v", "u"), "left_anti").count()
    assert(missing == 0L, s"$missing insert links lack their reverse")
    // a compacted generation carries no tombstone table of its own
    val fs = new org.apache.hadoop.fs.Path(g2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$g2/tombstones")),
      "a compacted generation must carry no tombstone table")
  }

  test("audit accounting: provenance split, conservation vs the overlays") {
    val rows = Similarity.simKnnGraphCompact(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("deg_out") ==
        r.getAs[Long]("n_repair") + r.getAs[Long]("n_insert"),
        s"provenance split does not cover vec_id ${r.getAs[Long]("vec_id")}")
      if (r.getAs[Boolean]("inserted"))
        assert(r.getAs[Long]("n_repair") == 0L,
          "an inserted vertex claims repaired-overlay edges")
    }
    assert(rows.exists(_.getAs[Boolean]("inserted")),
      "no inserted vertex in the gen-2 graph")
    assert(rows.exists(r => !r.getAs[Boolean]("inserted") &&
      r.getAs[Long]("n_insert") > 0L),
      "no base vertex received a reverse insert link")
    // total-degree conservation against the source overlays
    val del = Similarity.ensureKnnGraphDeleteIndex(spark, dir)
    val nRepair = spark.read.parquet(s"$del/edges").count()
    val dead = spark.read.parquet(s"$del/tombstones")
    val nInsertKept = Similarity.simKnnGraphUpsert(spark, dir)
      .join(dead, Seq("vec_id"), "left_anti").count()
    assert(rows.map(_.getAs[Long]("deg_out")).sum ==
      nRepair + 2 * nInsertKept,
      "gen-2 total degree != repaired + 2 x kept insert links")
  }
}
