package graft

import org.apache.spark.sql.functions._
import graft.queries.Similarity

/** Two-level deterministic train folds (VERDICT r15 item 1): buffer
  * boundedness — no aggregation buffer ever holds more than one
  * [[Similarity.foldW]]-wide vec_id bucket of rows — plus bit-exact
  * shuffle-order invariance and a hand-traced bucket-boundary case.
  */
class FoldSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def assignment() = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    Similarity.kmeansAssign(spark, dir, Similarity.kmeansSeeds(spark, dir, 8))
  }

  test("level-1 buffer is bounded by the bucket width on a real assignment") {
    // the r15 scale-killer was a per-cell collect of the WHOLE cell; the
    // two-level fold's level-1 group is (keys, bucket), and vec_ids are
    // unique per assignment row, so no group can exceed foldW rows — the
    // property that makes a 100 TB retrain's buffers bounded. Pin it on
    // the actual round-1 Lloyd assignment rather than by construction.
    val maxBucket = assignment()
      .groupBy(col("cid"),
        expr(s"((vec_id + ${Similarity.foldOff}L) div ${Similarity.foldW})"))
      .count().agg(max("count")).head().getLong(0)
    assert(maxBucket <= Similarity.foldW,
      s"level-1 group of $maxBucket rows exceeds the ${Similarity.foldW} bound")
  }

  test("meanFold2 is bit-identical under different shuffle layouts") {
    val assigned = assignment().select("vec_id", "embedding", "cid")
    def centroids(parts: Int): Map[Long, Seq[Double]] =
      Similarity.meanFold2(assigned.repartition(parts), Seq("cid"),
          "embedding", "0", 64)
        .select("cid", "centroid").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val a = centroids(3)
    val b = centroids(13)
    assert(a.keySet == b.keySet)
    a.keys.foreach { cid =>
      assert(a(cid) == b(cid), s"cell $cid centroid drifted across layouts")
    }
  }

  test("sumFold2 matches a hand-traced two-level fold across a bucket boundary") {
    import spark.implicits._
    // ids straddle the 4096 boundary: with foldOff = 2^40 (a multiple of
    // foldW) ids 0..4095 land in one bucket and 4096.. in the next, so
    // the fold is (v0 + v1) + (v4096 + v4097) — NOT the flat sequential
    // sum. Values chosen so the grouping changes the double result.
    val rows = Seq((0L, 1.0e16), (1L, 1.0), (4096L, -1.0e16), (4097L, 3.0))
    val keyed = rows.map { case (i, v) => (1L, i, v) }.toDF("g", "vec_id", "v")
    val r = Similarity.sumFold2(keyed, Seq("g"), "vec_id", "v", "s")
      .collect().head
    val expect = (1.0e16 + 1.0) + (-1.0e16 + 3.0)
    assert(r.getAs[Double]("s") == expect)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("vmax") == 1.0e16)
    // and the flat sequential fold would NOT land there — the grouping
    // is load-bearing, which is exactly what the oracle twin mirrors
    val flat = ((1.0e16 + 1.0) + -1.0e16) + 3.0
    assert(flat != expect)
  }
}
