package graft

import org.apache.spark.sql.functions._
import graft.queries.Text

/** Corpus snapshot versioning / time travel (VERDICT r12 item 6): the
  * append-only version log must serve read-at-version ≡ sequential
  * replay (the oracle proves it bit-for-bit; here the planted corpus
  * proves the MERGE interactions the carves exist for — resurrection,
  * delete-after-revision, retro-update of a prior insert), a point read
  * at version v must partition-prune every later batch, and the
  * standing log must be served, not rebuilt.
  */
class TimeTravelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val planted: String = {
    val spark2 = spark
    import spark2.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-tt").toString
    // 56: tombstoned at v1, resurrected by v2's revision; 27: revised at
    // v1, tombstoned at v3; 0: revised + inserted (-1) at v1, the insert
    // retro-updated at v3, second insert (-3) at v3; 8: never touched
    Seq((0L, "t0"), (8L, "t8"), (27L, "t27"), (56L, "t56"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def state(v: Int): Map[Long, String] =
    Text.readAtVersion(spark, planted, v).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("planted lifecycle: resurrection, delete-after-revision, retro-updated insert") {
    assert(state(0) == Map(0L -> "t0", 8L -> "t8", 27L -> "t27", 56L -> "t56"))
    assert(state(1) == Map(0L -> "t0 [v1]", -1L -> "new v1: t0",
      8L -> "t8", 27L -> "t27 [v1]"), "v1: 56 tombstoned, 0 revised+inserted")
    assert(state(2) == Map(0L -> "t0 [v1]", -1L -> "new v1: t0",
      8L -> "t8", 27L -> "t27 [v1]", 56L -> "t56 [v2]"),
      "v2 must RESURRECT the v1-tombstoned doc 56 via its revision")
    assert(state(3) == Map(0L -> "t0 [v1]", -1L -> "re: t0",
      8L -> "t8", 56L -> "t56 [v2]", -3L -> "new v3: t0"),
      "v3: 27 tombstoned after its v1 revision; insert -1 retro-updated")
  }

  test("a point read at version v partition-prunes every later batch") {
    Text.ensureVersionLog(spark, dir)
    // AQE off so the scan is visible in the static plan (the
    // sim_bq_indexed pin discipline); selectedPartitions is what the
    // scan will physically read
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val files = try {
      Text.readAtVersion(spark, dir, 1)
        .queryExecution.executedPlan.collect {
          case f: FileSourceScanExec if f.relation.location.rootPaths
            .exists(_.toString.contains("version_log")) =>
            f.selectedPartitions.toPartitionArray.map(_.filePath.toString).toSeq
        }.flatten
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(files.nonEmpty && files.exists(_.contains("ver=0")) &&
      files.exists(_.contains("ver=1")))
    assert(!files.exists(f => f.contains("ver=2") || f.contains("ver=3")),
      s"ver>1 partitions must be pruned from a read at v=1: ${files.toSeq}")
  }

  test("the point read and the all-versions audit agree at every version") {
    val audit = Text.pipelineTimeTravel(spark, dir).collect()
      .map(r => r.getAs[Int]("version") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("id_sum")))).toMap
    assert(audit.keySet == (0 to Text.ttVersions).toSet)
    (0 to Text.ttVersions).foreach { v =>
      val pr = Text.readAtVersion(spark, dir, v)
        .agg(count(lit(1)), sum("k")).collect().head
      assert((pr.getLong(0), pr.getLong(1)) == audit(v),
        s"point read at v=$v drifted from the audit row")
    }
  }

  test("planted CDC diff 1->3: resurrection surfaces as insert, retro-update as update") {
    val diff = Text.pipelineVersionDiff(spark, planted).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("id_sum")))).toMap
    // inserts: 56 (tombstoned at u=1, resurrected by v2 — a diff of
    // STATES must report it as an insert) and -3 (v3 insert, no event
    // <= u at all — the null-masked max_by branch)
    assert(diff("insert") == ((2L, 53L)), s"got $diff")
    // delete: 27 (revised at v1, tombstoned at v3)
    assert(diff("delete") == ((1L, 27L)), s"got $diff")
    // update: -1 (the v1 insert retro-payloaded at v3); 0 and 8 are
    // unchanged between the endpoints and must NOT be reported
    assert(diff("update") == ((1L, -1L)), s"got $diff")
    assert(diff.size == 3)
  }

  test("checkpoint+tail serving equals the full-log audit and never scans the absorbed prefix") {
    val full = Text.pipelineTimeTravel(spark, dir).collect()
      .map(r => r.getAs[Int]("version") -> r.toSeq.dropRight(1)).toMap
    val ck = Text.pipelineCheckpoint(spark, dir).collect()
    assert(ck.map(_.getAs[Int]("version")).toSeq ==
      (Text.ttCheckpointVer to Text.ttVersions).toSeq)
    ck.foreach { r =>
      assert(r.toSeq.dropRight(1) == full(r.getAs[Int]("version")),
        s"compacted serve drifted from the full-log audit at v=${r.get(0)}")
    }
    // the compacted read's version_log scan touches ONLY tail partitions
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val files = try {
      Text.pipelineCheckpoint(spark, dir)
        .queryExecution.executedPlan.collect {
          case f: FileSourceScanExec if f.relation.location.rootPaths
            .exists(_.toString.contains("version_log")) =>
            f.selectedPartitions.toPartitionArray.map(_.filePath.toString).toSeq
        }.flatten
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(files.nonEmpty && files.forall(_.contains("ver=3")),
      s"absorbed prefix partitions leaked into the compacted read: ${files.toSeq}")
  }

  test("checkpointing never mutates the standing version log") {
    val logBase = Text.ensureVersionLog(spark, dir)
    val marker = new org.apache.hadoop.fs.Path(s"$logBase/events/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t0 = fs.getFileStatus(marker).getModificationTime
    Text.ensureTtCheckpoint(spark, dir)
    Text.pipelineCheckpoint(spark, dir).collect()
    assert(fs.getFileStatus(marker).getModificationTime == t0,
      "the checkpoint overlay must leave the append-only log untouched")
  }

  test("the vacuumed log serves every surviving version and reads neither the log nor the checkpoint") {
    val ck = Text.pipelineCheckpoint(spark, dir).collect()
      .map(r => r.getAs[Int]("version") -> r.toSeq.dropRight(1)).toMap
    val vac = Text.pipelineVacuum(spark, dir).collect()
    assert(vac.map(_.getAs[Int]("version")).toSeq ==
      (Text.ttCheckpointVer to Text.ttVersions).toSeq)
    vac.foreach { r =>
      assert(r.toSeq.dropRight(2) == ck(r.getAs[Int]("version")),
        s"vacuumed serve drifted at v=${r.get(0)}")
      assert(r.getAs[Int]("horizon") == Text.ttCheckpointVer)
      assert(r.getAs[Long]("vacuumed_events") > 0,
        "a vacuum that reclaimed nothing proves nothing")
    }
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val roots = try {
      Text.pipelineVacuum(spark, dir)
        .queryExecution.executedPlan.collect {
          case f: FileSourceScanExec =>
            f.relation.location.rootPaths.map(_.toString)
        }.flatten
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(roots.nonEmpty && roots.forall(_.contains("tt_vacuum")),
      s"the vacuumed serve must read ONLY the truncated log: $roots")
  }

  test("a below-horizon read names its failure; at-horizon and above match the un-vacuumed log") {
    val e = intercept[IllegalArgumentException] {
      Text.readAtVersionVacuumed(spark, dir, Text.ttCheckpointVer - 1)
    }
    assert(e.getMessage.contains("vacuum horizon"))
    (Text.ttCheckpointVer to Text.ttVersions).foreach { v =>
      val vac = Text.readAtVersionVacuumed(spark, dir, v)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val full = Text.readAtVersion(spark, dir, v)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(vac == full, s"vacuumed point read drifted at v=$v")
    }
  }

  test("planted OCC: write-write conflicts are rejected, the remainder serializes") {
    val spark2 = spark
    import spark2.implicits._
    // A (tt v1 carve) writes {9 rev, 5 del, 107 del, -105 ins};
    // B (occ carve) writes {5 rev, 9 rev, 13 rev, 107 del} — conflicts
    // {5, 9, 107} span all three shapes: update-update, delete-update,
    // delete-delete; B's rev of 13 is disjoint (A only INSERTED -105
    // from doc 13 — key-level detection must not conflate them)
    val d = java.nio.file.Files.createTempDirectory("graft-occ").toString
    Seq((5L, "t5"), (8L, "t8"), (9L, "t9"), (13L, "t13"), (107L, "t107"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = Text.pipelineWriteConflict(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("id_sum")))).toMap
    assert(rows("a_committed") == ((4L, 16L)), s"got $rows")
    assert(rows("b_rejected") == ((3L, 121L)),
      s"conflicts must be exactly {5, 9, 107}: $rows")
    assert(rows("b_committed") == ((1L, 13L)),
      s"B's disjoint revision of 13 must survive: $rows")
    // final: {8, 9->[v1], 13->[wb], -105}; 5 and 107 stay deleted by A
    // (B's rejected rev of 5 must NOT resurrect it)
    assert(rows("final_state") == ((4L, -75L)), s"got $rows")
  }

  test("the standing log is served, not rebuilt per read") {
    val base = Text.ensureVersionLog(spark, dir)
    val marker = new org.apache.hadoop.fs.Path(s"$base/events/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t0 = fs.getFileStatus(marker).getModificationTime
    Text.pipelineTimeTravel(spark, dir).collect()
    Text.readAtVersion(spark, dir, 2).collect()
    assert(fs.getFileStatus(marker).getModificationTime == t0,
      "reads must not rewrite the standing version log")
  }

  test("branch merge: conflicts recomputed from first principles; merge moves the head") {
    val audit = Text.pipelineBranchMerge(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(audit.keySet ==
      Set("branch_head", "conflicts", "main_head", "merged"))
    // first-principles conflict set: branch batch keys ∩ keys any main
    // post-fork batch touches (re-derived from the shared carves)
    val base = Tables(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val bbKeys = base.filter(_ % Text.brRevMod == Text.brRevRem).toSet ++
      base.filter(d => d % Text.brDelMod == Text.brDelRem &&
        d % Text.brRevMod != Text.brRevRem).toSet ++
      base.filter(_ % Text.brInsMod == 0)
        .map(d => -8 * d - Text.brInsSlot).toSet
    val post: Set[Long] = (Text.brForkVer + 1 to Text.ttVersions).flatMap { v =>
      val (rm, rr, dm, dr, im) = Text.ttCarves(v - 1)
      val rev = base.filter(_ % rm == rr)
      val del = base.filter(d => d % dm == dr && d % rm != rr)
      val ins = if (im > 0) base.filter(_ % im == 0).map(_ * -8L - v)
        else Array.empty[Long]
      val retro = if (v == Text.ttVersions)
        base.filter(_ % Text.ttRetroMod == 0).map(_ * -8L - 1)
        else Array.empty[Long]
      rev ++ del ++ ins ++ retro
    }.toSet
    val conf = bbKeys.intersect(post)
    assert(conf.nonEmpty, "the planted geometry must conflict somewhere")
    assert(conf.size < bbKeys.size, "some branch events must survive")
    val c = audit("conflicts")
    assert(c.getAs[Long]("n_rows") == conf.size.toLong,
      s"conflict count ${c.getAs[Long]("n_rows")} vs derived ${conf.size}")
    assert(c.getAs[Long]("k_xor") == conf.foldLeft(0L)(_ ^ _),
      "conflict key set diverged from first principles")
    // the merge applied something: merged differs from BOTH parents
    assert(audit("merged").getAs[Long]("text_xor") !=
      audit("main_head").getAs[Long]("text_xor"),
      "merge must move the main head")
    assert(audit("merged").getAs[Long]("text_xor") !=
      audit("branch_head").getAs[Long]("text_xor"),
      "merge must not simply adopt the branch head")
  }

  test("corpus drift: the top-k cut plans as a distributed partial top-k") {
    // the scaladoc's scale claim made physical: the |vocabulary|-sized
    // count frame is cut by TakeOrderedAndProject (per-partition top-k
    // + one bounded merge), never a global sort of the vocabulary
    val df = Text.pipelineCorpusDrift(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "the top-|delta| cut must be a partial top-k")
  }

  test("budget drift: both endpoints spend exactly half their capacity, to the token") {
    val rows = Text.pipelineBudgetDrift(spark, dir).collect()
    assert(rows.nonEmpty)
    // the water-fill law at EACH endpoint: allocations sum to
    // floor(total capacity / 2) exactly — no float share ever rounds
    // the budget away (the txMixWaterfill invariant, here across two
    // replayed states at once)
    val capF = rows.map(_.getAs[Long]("cap_from")).sum
    val capT = rows.map(_.getAs[Long]("cap_to")).sum
    assert(rows.map(_.getAs[Long]("alloc_from")).sum == capF / 2)
    assert(rows.map(_.getAs[Long]("alloc_to")).sum == capT / 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("cap_delta") ==
        r.getAs[Long]("cap_to") - r.getAs[Long]("cap_from"))
      assert(r.getAs[Long]("alloc_delta") ==
        r.getAs[Long]("alloc_to") - r.getAs[Long]("alloc_from"))
      assert(r.getAs[Long]("alloc_from") <= r.getAs[Long]("cap_from"))
      assert(r.getAs[Long]("alloc_to") <= r.getAs[Long]("cap_to"))
    }
    // the three edit batches move real token mass between the endpoints
    assert(rows.map(_.getAs[Long]("cap_delta")).exists(_ != 0L))
  }

  test("quality drift: rule counts cohere with the replayed states; edits move real flags") {
    val rows = Text.pipelineQualityDrift(spark, dir).collect()
    assert(rows.nonEmpty && rows.length % 5 == 0, "5 rules per language")
    rows.foreach { r =>
      assert(r.getAs[Long]("fail_delta") ==
        r.getAs[Long]("n_fail_to") - r.getAs[Long]("n_fail_from"))
      assert(r.getAs[Long]("n_fail_from") <= r.getAs[Long]("n_docs_from"))
      assert(r.getAs[Long]("n_fail_to") <= r.getAs[Long]("n_docs_to"))
    }
    // every rule row of one language reports the SAME doc universe,
    // and it equals the replayed state's per-language census
    val attrs = Tables(spark, dir, "documents")
      .select(col("doc_id").as("o_id"), col("lang"))
    def census(v: Int): Map[String, Long] =
      Text.readAtVersion(spark, dir, v)
        .withColumn("o_id",
          expr("CASE WHEN k >= 0 THEN k ELSE (-k) div 8 END"))
        .join(attrs, "o_id")
        .groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cf = census(Text.ttDiffFrom)
    val ct = census(Text.ttDiffTo)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      assert(rs.map(_.getAs[Long]("n_docs_from")).distinct.length == 1)
      assert(rs.head.getAs[Long]("n_docs_from") == cf(lang), s"lang $lang")
      assert(rs.head.getAs[Long]("n_docs_to") == ct(lang), s"lang $lang")
    }
    // the three edit batches change at least one rule's failure count
    assert(rows.exists(_.getAs[Long]("fail_delta") != 0L),
      "edit batches left every quality flag unchanged")
  }

  test("corpus drift: version markers surface with zero prior mass; integer algebra exact") {
    val rows = Text.pipelineCorpusDrift(spark, dir).collect()
    assert(rows.length == Text.driftTopK)
    // batch 3 revises inside the (ttDiffFrom, ttDiffTo] window: its
    // " [v3]" suffix token is NEW corpus mass and must top the movers;
    // batch 2's marker likewise (both measured rank 1-2 at sf0.001)
    Seq("[v2]", "[v3]").foreach { m =>
      val r = rows.find(_.getAs[String]("token") == m)
      assert(r.isDefined, s"marker token $m missing from the drift head")
      assert(r.get.getAs[Long]("n_from") == 0L, s"$m existed before?")
      assert(r.get.getAs[Long]("delta") > 0L)
    }
    // batch 2/3 revise docs batch 1 already revised, so [v1] mass must
    // SHRINK across the window — the overwrite made visible
    val v1 = rows.find(_.getAs[String]("token") == "[v1]")
    assert(v1.isDefined && v1.get.getAs[Long]("delta") < 0L,
      "the [v1] marker must lose mass to later revisions")
    // exact integer algebra on every row
    rows.foreach { r =>
      assert(r.getAs[Long]("delta") ==
        r.getAs[Long]("n_to") - r.getAs[Long]("n_from"))
      assert(r.getAs[Long]("share_from_ppm") ==
        r.getAs[Long]("n_from") * 1000000L / r.getAs[Long]("total_from"))
      assert(r.getAs[Long]("share_to_ppm") ==
        r.getAs[Long]("n_to") * 1000000L / r.getAs[Long]("total_to"))
    }
    // the attached corpus totals equal the directly recomputed state
    // token masses (the unpartitioned-window attach carried real sums)
    val tf = Text.readAtVersion(spark, dir, Text.ttDiffFrom)
      .select(explode(split(col("text"), " "))).count()
    val tt = Text.readAtVersion(spark, dir, Text.ttDiffTo)
      .select(explode(split(col("text"), " "))).count()
    assert(rows.head.getAs[Long]("total_from") == tf)
    assert(rows.head.getAs[Long]("total_to") == tt)
  }
}
