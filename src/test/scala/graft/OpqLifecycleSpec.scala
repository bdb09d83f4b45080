package graft

import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** OPQ lifecycle symmetry (VERDICT r13 item 4 — the last index family
  * that was build/serve only): frozen-rotation upsert admission, the
  * physically rewritten delete overlay, and the rotated-space drift
  * audit — with the standing rotated index provably untouched (the
  * SqLifecycleSpec discipline).
  */
class OpqLifecycleSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"

  private def successMtime(path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path + "/_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p).getModificationTime
  }

  test("opq lifecycle: audits partition the base exactly and never mutate the standing index") {
    val main = Similarity.ensureOpqIndex(spark, sf001)
    val before = successMtime(s"$main/codes")
    val del = Similarity.simOpqDelete(spark, sf001).collect()
    del.foreach { r =>
      assert(r.getAs[Long]("n_base") ==
        r.getAs[Long]("n_dead") + r.getAs[Long]("n_live"),
        s"occupancy not partitioned at (s=${r.getAs[Int]("s")}, " +
          s"code=${r.getAs[Long]("code")})")
    }
    val ups = Similarity.simOpqUpsert(spark, sf001).collect()
    // every admitted vector yields exactly one code per subspace
    val nDelta = Tables(spark, sf001, "embeddings")
      .filter(col("vec_id") % Similarity.upsertDeltaMod === 0).count()
    assert(ups.map(_.getAs[Long]("n_new")).sum ==
      nDelta * Similarity.pqM)
    ups.filter(_.getAs[Long]("n_new") > 0).foreach { r =>
      assert(r.getAs[Long]("first_new_id") < 0,
        "admitted code not from the reserved negative key space")
    }
    assert(Similarity.simOpqDrift(spark, sf001).collect().nonEmpty)
    // lifecycle ops serve audits; the standing rotated code table and
    // the frozen codebooks never rewrite
    assert(successMtime(s"$main/codes") == before,
      "a lifecycle audit rewrote the standing OPQ index")
  }

  test("opq delete overlay: no tombstoned vector holds a code, no live code lost") {
    val main = Similarity.ensureOpqIndex(spark, sf001)
    val del = Similarity.ensureOpqDeleteIndex(spark, sf001)
    val live = spark.read.parquet(s"$del/codes")
    live.select("vec_id").distinct().collect().foreach { r =>
      assert(r.getLong(0) % Similarity.pqDelMod != Similarity.pqDelRem,
        s"deleted vector ${r.getLong(0)} still holds overlay codes")
    }
    // the overlay is exactly the base minus the carve — row for row
    val expected = spark.read.parquet(s"$main/codes")
      .filter(!(col("vec_id") % Similarity.pqDelMod === Similarity.pqDelRem))
      .count()
    assert(live.count() == expected)
  }

  test("opq delete serve: no tombstoned id ever surfaces from the overlay") {
    val served = Similarity.simOpqAdcDeleted(spark, sf001).collect()
    assert(served.nonEmpty)
    served.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(id % Similarity.pqDelMod != Similarity.pqDelRem,
        s"deleted vector $id surfaced as an ADC candidate")
    }
  }

  test("opq retrain: warm Lloyd under the frozen rotation never worsens total SSE") {
    val rows = Similarity.simOpqRetrain(spark, sf001).collect()
    assert(rows.nonEmpty)
    // the kmeansWarmState theorem in rotated space, per subspace:
    // warm-started Lloyd is non-increasing in total squared distance
    rows.groupBy(_.getAs[Int]("s")).foreach { case (s, rs) =>
      val oldSse = rs.flatMap(r => Option(r.getAs[java.lang.Double]("old_sse")))
        .map(_.doubleValue).sum
      val newSse = rs.flatMap(r => Option(r.getAs[java.lang.Double]("new_sse")))
        .map(_.doubleValue).sum
      assert(newSse <= oldSse, s"subspace $s: retrain worsened SSE")
    }
    // movement bookkeeping balances: total entered == total left
    assert(rows.map(_.getAs[Long]("n_entered")).sum ==
      rows.map(_.getAs[Long]("n_left")).sum)
    // occupancy conserves the union row count per subspace
    rows.groupBy(_.getAs[Int]("s")).foreach { case (s, rs) =>
      assert(rs.map(_.getAs[Long]("n_before")).sum ==
        rs.map(_.getAs[Long]("n_after")).sum, s"subspace $s occupancy")
    }
  }

  test("opq drift: the 5/4-amplitude delta flags retrain in every subspace") {
    val rows = Similarity.simOpqDrift(spark, sf001).collect()
    assert(rows.length == Similarity.pqM)
    rows.foreach { r =>
      val base = r.getAs[Double]("base_msd")
      val fresh = r.getAs[Double]("new_msd")
      assert(base > 0.0 && fresh > 0.0)
      // the decision is the exact integer-scaled ratio test — the row
      // must be self-consistent with the published rule
      assert(r.getAs[Boolean]("retrain") == (fresh * 100 > base * 150))
      // measured at sf0.001 and sf0.1: the hotter-encoder batch
      // quantizes ~1.5-1.7x worse under the frozen rotation + books,
      // so every subspace flags the deliberate retrain
      assert(r.getAs[Boolean]("retrain"),
        s"subspace ${r.getAs[Int]("s")} under-detected amplitude drift")
    }
  }
}
