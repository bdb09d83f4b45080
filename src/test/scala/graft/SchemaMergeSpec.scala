package graft

import org.apache.spark.sql.functions._
import graft.queries.Text

/** Schema evolution (pipeline_schema_merge): the widened epoch and the
  * original epoch must serve as ONE relation under the mergeSchema
  * read, with the old epoch's missing column surfacing as NULL — and
  * nothing else about the old rows changed.
  */
class SchemaMergeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("evolved read: old epoch nulls the new column, both epochs keep every row") {
    val audit = Text.pipelineSchemaMerge(spark, dir).collect()
      .map(r => r.getBoolean(0) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("tok_sum")))).toMap
    assert(audit.keySet == Set(true, false))
    val base = Tables(spark, dir, "documents")
    val (nOld, nNew) = (base.filter(col("doc_id") % 5 =!= 0).count(),
      base.filter(col("doc_id") % 5 === 0).count())
    assert(audit(false)._1 == nOld && audit(true)._1 == nNew,
      s"epoch row counts drifted: $audit")
    // the old epoch's extension is ALL null — its sum is exactly zero,
    // while the widened epoch's is positive (texts are non-empty)
    assert(audit(false)._2 == 0L && audit(true)._2 > 0L, s"got $audit")
  }

  test("compact-files: physical rewrite shrinks the file set and moves every row exactly once") {
    val rows = Text.pipelineCompactFiles(spark, dir).collect()
      .map(r => r.getAs[String]("phase") -> r).toMap
    assert(rows.keySet == Set("before", "after"))
    val (b, a) = (rows("before"), rows("after"))
    assert(b.getAs[Long]("n_files") == Text.compactSmallFiles.toLong,
      s"landing fragment count: $b")
    val n = b.getAs[Long]("n_rows")
    val expectAfter =
      (n + Text.compactRowsPerFile - 1) / Text.compactRowsPerFile
    assert(a.getAs[Long]("n_files") == expectAfter, s"bin-pack count: $a")
    assert(a.getAs[Long]("n_files") < b.getAs[Long]("n_files"),
      "compaction must reduce the file count")
    // loss proof: identical cardinality and content checksums
    assert(a.getAs[Long]("n_rows") == n)
    assert(a.getAs[Long]("id_xor") == b.getAs[Long]("id_xor"))
    assert(a.getAs[Long]("text_xor") == b.getAs[Long]("text_xor"))
  }

  test("orphan audit: staging files are invisible to the serving read and fully accounted") {
    val rows = Text.pipelineOrphanAudit(spark, dir).collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    assert(rows.keySet == Set("orphaned", "served"))
    val n = Tables(spark, dir, "documents").count()
    val carve = Tables(spark, dir, "documents")
      .filter(col("doc_id") % Text.orphanMod === Text.orphanRem).count()
    assert(carve > 0, "the planted failure must leave rows behind")
    // the serving read leaks nothing from the staging dir
    assert(rows("served").getAs[Long]("n_rows") == n,
      s"served read leaked orphan rows: ${rows("served")}")
    assert(rows("orphaned").getAs[Long]("n_rows") == carve)
    assert(rows("orphaned").getAs[Long]("n_files") ==
      Text.orphanFiles.toLong)
    assert(rows("served").getAs[Long]("n_files") ==
      Tables(spark, dir, "documents").select("lang").distinct().count(),
      "one visible file per lang partition")
  }

  test("partition evolution: the new layout prunes, the old layout only pushes") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val (e1, e2) = Text.ensurePartitionEpochs(spark, dir)
    def scanFiles(path: String): Seq[String] = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try spark.read.parquet(path).filter(col("lang") === "de")
        .queryExecution.executedPlan.collect {
          case f: FileSourceScanExec =>
            f.selectedPartitions.toPartitionArray
              .map(_.filePath.toString).toSeq
        }.flatten
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    // epoch 2 (evolved, lang-partitioned): the filter prunes directories
    val f2 = scanFiles(e2)
    assert(f2.nonEmpty && f2.forall(_.contains("lang=de")),
      s"evolved epoch must read only the lang=de partition: $f2")
    // epoch 1 (legacy, source-partitioned): every source dir survives —
    // evolution never rewrites old data, the filter can only push down
    val f1 = scanFiles(e1)
    val sources = f1.flatMap(_.split("/").find(_.startsWith("source="))).distinct
    val carveSources = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 5 =!= 0).select("source").distinct().count()
    assert(sources.size == carveSources,
      s"legacy epoch cannot prune a lang filter; got ${sources.size} " +
        s"of $carveSources source partitions")
    val plan = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try spark.read.parquet(e1).filter(col("lang") === "de")
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,de)]"),
      s"lang filter must push into the legacy epoch's row groups:\n$plan")
  }
}
