package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingOps

/** Structured Streaming specs: the same transforms run under readStream
  * (file source, availableNow) must agree with their batch twins, and
  * custom flatMapGroupsWithState state must accumulate across
  * micro-batches.
  */
class StreamingSpec extends SparkSpec {

  // The streaming file source needs a directory; stage the single-file
  // testdata parquet into one.
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streamed tumbling window equals the batch result (file source)") {
    val stream = StreamingOps.readEventsStream(spark, eventsDir)
    assert(stream.isStreaming)
    val q = StreamingOps.tumblingCounts(stream)
      .writeStream.format("memory").queryName("tumbling_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")

    val streamed = spark.table("tumbling_stream")
      .orderBy("window_start", "event_type").collect()
    val batch = StreamingOps.tumblingCounts(Tables(spark, "/root/testdata/sf0.001", "events"))
      .orderBy("window_start", "event_type").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.zip(batch).forall { case (a, b) => a == b })
  }

  test("readEventsStream tolerates an empty source directory (ADVICE r7-2)") {
    // A file stream's normal starting state is an empty directory; the
    // schema probe must fall back to the legacy long-ts encoding instead
    // of throwing "Unable to infer schema", and data arriving later in
    // that encoding must flow. Stage nothing first, then drop in a
    // nanos-as-long file and drain.
    val dir = java.nio.file.Files.createTempDirectory("events-empty-stream")
    val stream = StreamingOps.readEventsStream(spark, dir.toString)
    assert(stream.isStreaming, "empty-dir probe must still build a stream")
    assert(stream.schema.fieldNames.contains("ts"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("late.parquet"))
    val q = stream.groupBy("event_type").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("empty_start_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val n = spark.table("empty_start_stream")
      .agg(sum("n")).collect().head.getLong(0)
    val expected = Tables(spark, "/root/testdata/sf0.001", "events").count()
    assert(n == expected, s"late-arriving file rows lost: $n != $expected")
  }

  test("session windows: batch twin of the streaming transform matches Events query") {
    val viaStreamingOps = StreamingOps.sessionCounts(
      Tables(spark, "/root/testdata/sf0.001", "events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"),
        max("n_events").as("max_session_events"))
      .orderBy("user_id").collect()
    val viaQuery = graft.queries.Events.evSessionWindow(spark, "/root/testdata/sf0.001")
      .collect()
    assert(viaStreamingOps.length == viaQuery.length)
    assert(viaStreamingOps.zip(viaQuery).forall { case (a, b) => a == b })
  }

  test("streamed watermarked dedup drops duplicate event ids, equals batch distinct") {
    // Stage the events file TWICE: the stream sees every event duplicated
    // across two files; dropDuplicatesWithinWatermark must emit each
    // event_id once.
    val dir = java.nio.file.Files.createTempDirectory("events-dup-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("b.parquet"))
    val stream = StreamingOps.readEventsStream(spark, dir.toString)
    val q = StreamingOps.dedupedEvents(stream)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val streamed = spark.table("dedup_stream").orderBy("event_type").collect()
    val batch = StreamingOps.dedupedEvents(
        Tables(spark, "/root/testdata/sf0.001", "events"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.zip(batch).forall { case (a, b) => a == b })
  }

  test("stream-stream interval join matches its batch twin") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val pIn = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val vIn = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val pDf = pIn.toDF().toDF("event_id", "user_id", "ts", "value")
    val vDf = vIn.toDF().toDF("event_id", "user_id", "ts", "value")
    val q = StreamingOps.purchaseViewJoin(pDf, vDf)
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    // user 1: view 10:00 then purchase 10:30 (match); view 8:00 (too old)
    // user 2: purchase with no view
    vIn.addData((100L, 1L, ts("2024-01-01 10:00:00"), 0.1),
      (101L, 1L, ts("2024-01-01 08:00:00"), 0.2))
    pIn.addData((200L, 1L, ts("2024-01-01 10:30:00"), 9.99),
      (201L, 2L, ts("2024-01-01 10:30:00"), 5.00))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ss_join").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("purchase_id") == 200L)
    assert(rows.head.getAs[java.sql.Timestamp]("view_ts") == ts("2024-01-01 10:00:00"))
    // batch twin over the same data agrees
    val pB = Seq((200L, 1L, ts("2024-01-01 10:30:00"), 9.99),
      (201L, 2L, ts("2024-01-01 10:30:00"), 5.00))
      .toDF("event_id", "user_id", "ts", "value")
    val vB = Seq((100L, 1L, ts("2024-01-01 10:00:00"), 0.1),
      (101L, 1L, ts("2024-01-01 08:00:00"), 0.2))
      .toDF("event_id", "user_id", "ts", "value")
    val batch = StreamingOps.purchaseViewJoin(pB, vB).collect()
    assert(batch.toSeq == rows.toSeq)
  }

  test("watermark drops events later than the allowed lateness") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    // 10-minute lateness so the second batch's hour-old event is late
    val agg = events.withWatermark("ts", "10 minutes")
      .groupBy(org.apache.spark.sql.functions.window($"ts", "1 hour"), $"event_type")
      .count()
    val q = agg.writeStream.format("memory").queryName("late_data")
      .outputMode("update").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 12:00:00"), "click", 1.0)) // advances watermark to 11:50
    q.processAllAvailable()
    input.addData((ts("2024-01-01 10:10:00"), "click", 1.0)) // 10:xx window closed
    q.processAllAvailable()
    q.stop()
    val tenOclock = spark.table("late_data")
      .filter("window.start = TIMESTAMP '2024-01-01 10:00:00'")
      .agg(org.apache.spark.sql.functions.max("count")).collect().head.getLong(0)
    assert(tenOclock == 1L, "late event must not increment the closed window")
  }

  test("flatMapGroupsWithState accumulates across micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val events = input.toDF().toDF("user_id", "event_type", "value")
    val q = StreamingOps.runningUserTotals(events)
      .writeStream.format("memory").queryName("running_totals")
      .outputMode("update").start()

    input.addData((1L, "click", 1.50), (1L, "view", 2.25), (2L, "click", 10.00))
    q.processAllAvailable()
    input.addData((1L, "purchase", 0.25))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("running_totals")
      .groupBy("user_id").agg(max("n_events").as("n"), max("total_cents").as("cents"))
      .orderBy("user_id").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 400L), (2L, 1L, 1000L))) // state carried into batch 2
  }

  test("stream-static enrichment join equals its batch twin") {
    val sf = "/root/testdata/sf0.001"
    // static dimension: per-user lifetime stats computed in batch
    val userStats = Tables(spark, sf, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("lifetime_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("lifetime_cents"))
    val stream = StreamingOps.readEventsStream(spark, eventsDir)
    val q = StreamingOps.enrichedPurchases(stream, userStats)
      .writeStream.format("memory").queryName("enriched_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val streamed = spark.table("enriched_stream")
      .orderBy("event_id").collect()
    val batch = StreamingOps.enrichedPurchases(
        Tables(spark, sf, "events"), userStats)
      .orderBy("event_id").collect()
    assert(streamed.length == batch.length && streamed.nonEmpty)
    assert(streamed.zip(batch).forall { case (a, b) => a == b })
    // every purchase kept its enrichment (left join, dim covers all users)
    assert(streamed.forall(!_.isNullAt(4)))
  }

  test("streaming decontamination flags exactly the batch drop-list") {
    val sf = "/root/testdata/sf0.01"
    val docsDir = java.nio.file.Files.createTempDirectory("docs-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      docsDir.resolve("documents.parquet"))
    val bench = StreamingOps.benchmarkShingles(spark, sf)
    val stream = StreamingOps.readDocumentsStream(spark, docsDir.toString)
      // train side only — the benchmark's own docs are not candidates
      .filter(col("source") =!= "src0")
    val q = StreamingOps.contaminatedDocs(stream, bench)
      .writeStream.format("memory").queryName("contaminated_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val streamedIds = spark.table("contaminated_stream")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    // batch oracle: the per-lang counts of tx_decontaminate
    val batchTotal = graft.queries.Text.txDecontaminate(spark, sf)
      .agg(sum("n_contaminated")).collect().head.getLong(0)
    assert(streamedIds.nonEmpty, "planted cross-source dups must be flagged")
    assert(streamedIds.size.toLong == batchTotal,
      s"streamed drop-list ${streamedIds.size} != batch $batchTotal")
  }

  test("hashed-key streaming decontamination flags exactly the batch drop-list") {
    val sf = "/root/testdata/sf0.01"
    val docsDir = java.nio.file.Files.createTempDirectory("docs-hashed-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      docsDir.resolve("documents.parquet"))
    val benchKeys = StreamingOps.benchmarkShingleKeys(spark, sf)
    val stream = StreamingOps.readDocumentsStream(spark, docsDir.toString)
      .filter(col("source") =!= "src0")
    val q = StreamingOps.contaminatedDocsHashed(stream, benchKeys)
      .writeStream.format("memory").queryName("contaminated_hashed_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val streamedIds = spark.table("contaminated_hashed_stream")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val batchTotal = graft.queries.Text.txDecontaminateHashed(spark, sf)
      .agg(sum("n_contaminated")).collect().head.getLong(0)
    assert(streamedIds.nonEmpty, "planted cross-source dups must be flagged")
    assert(streamedIds.size.toLong == batchTotal,
      s"hashed streamed drop-list ${streamedIds.size} != batch $batchTotal")
  }

  test("streaming fuzzy decontamination flags exactly the batch drop-list") {
    // sf0.001, NOT sf0.01: the larger corpus has no same-lang train-vs-
    // benchmark pair at Jaccard >= 0.5, so its drop-list is empty and the
    // equality would pass vacuously; sf0.001 plants one (es doc 82).
    val sf = "/root/testdata/sf0.001"
    val docsDir = java.nio.file.Files.createTempDirectory("docs-fuzzy-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      docsDir.resolve("documents.parquet"))
    val (benchBands, benchShingles) = StreamingOps.fuzzyBenchmarkSides(spark, sf)
    val stream = StreamingOps.readDocumentsStream(spark, docsDir.toString)
      .filter(col("source") =!= "src0")
    val q = StreamingOps.fuzzyContaminatedDocs(stream, benchBands, benchShingles)
      .writeStream.format("memory").queryName("fuzzy_contaminated_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val streamedIds = spark.table("fuzzy_contaminated_stream")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val batchTotal = graft.queries.Text.txFuzzyDecontaminate(spark, sf)
      .agg(sum("n_flagged")).collect().head.getLong(0)
    assert(streamedIds.nonEmpty, "planted near-dup contamination must be flagged")
    assert(streamedIds.size.toLong == batchTotal,
      s"streamed fuzzy drop-list ${streamedIds.size} != batch $batchTotal")
  }

  test("streaming incremental dedup admits exactly the batch digest set") {
    // Planted corpus (the TextOpsSpec fixture): delta docs 0/5/10/15 where
    // 0 duplicates base doc 1, 5 and 10 duplicate each other with no base
    // copy, 15 is new — expected admitted digests: {dup B, unique C}.
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ddinc-stream").toString
    Seq(
      (0L, "dup A", "en", "src1"), (1L, "dup A", "en", "src1"),
      (2L, "unique D", "en", "src1"), (3L, "unique E", "en", "src1"),
      (5L, "dup B", "en", "src1"), (10L, "dup B", "en", "src1"),
      (15L, "unique C", "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val baseKeys = StreamingOps.baseDigestKeys(spark, dir)
    val stream = StreamingOps.readDocumentsStream(spark, s"$dir/documents.parquet")
      .filter(pmod(col("doc_id"), lit(5L)) === 0)
    val q = StreamingOps.admittedDeltaDocs(stream, baseKeys)
      .writeStream.format("memory").queryName("admitted_delta_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val admitted = spark.table("admitted_delta_stream")
    // one admitted row per NEW digest, matching the batch count...
    val batchAdmitted = graft.queries.Text.ddIncremental(spark, dir)
      .agg(sum("n_admitted")).collect().head.getLong(0)
    assert(admitted.count() == batchAdmitted,
      s"streamed admitted ${admitted.count()} != batch $batchAdmitted")
    // ...and the digest SET equals delta-digests minus base-digests
    val streamedHks = admitted.select("hk").collect().map(_.getLong(0)).toSet
    val expectedHks = Seq("dup B", "unique C").map { t =>
      spark.sql(s"SELECT CAST(conv(substring(md5(cast('$t' AS BINARY)), 1, 15), 16, 10) AS BIGINT)")
        .collect().head.getLong(0)
    }.toSet
    assert(streamedHks == expectedHks)
  }

  test("streaming fuzzy admission against the standing index equals the batch audit") {
    // Delta docs arrive as a stream and probe the MATERIALIZED fuzzy
    // index (stream-static joins against the bucketed band + shingle
    // tables); the per-language vs-base near-dup counts must equal
    // ddIncrementalFuzzyIndexed's audit exactly. (Delta-delta dups are
    // the upstream exact-digest stage's job — the vs-base leg is what
    // the standing index serves.)
    val dir = "/root/testdata/sf0.001"
    val (bands, shingles) = StreamingOps.fuzzyIndexTables(spark, dir)
    val landing = java.nio.file.Files
      .createTempDirectory("graft-fuzzy-admit-stream").toString
    Tables(spark, dir, "documents")
      .write.mode("overwrite").parquet(s"$landing/documents.parquet")
    val deltaStream = StreamingOps
      .readDocumentsStream(spark, s"$landing/documents.parquet")
      .filter(pmod(col("doc_id"), lit(5L)) === 0)
    val q = StreamingOps.fuzzyAdmittedDocs(deltaStream, bands, shingles)
      .writeStream.format("memory").queryName("fuzzy_admit_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val streamed = spark.table("fuzzy_admit_stream")
    val streamedDups = streamed.filter(col("near_dup_vs_base"))
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val audit = graft.queries.Text.ddIncrementalFuzzyIndexed(spark, dir)
      .collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_near_dup_vs_base"))
      .filter(_._2 > 0).toMap
    assert(streamedDups == audit,
      s"streamed vs-base dups $streamedDups != batch audit $audit")
    // every band-able delta doc got exactly one decision row
    val expectedDocs = Tables(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(5L)) === 0 &&
        size(split(col("text"), " ")) >= 3).count()
    assert(streamed.count() == expectedDocs)
  }

  test("streaming merge classify equals the batch audit's changed partitions") {
    // Updates arrive as a stream against the static sf0.001 snapshot; the
    // per-action row counts and key sums must equal the batch MERGE
    // audit's update/insert/delete rows ('unchanged' is batch-only — it
    // needs the full base sweep).
    val dir = "/root/testdata/sf0.001"
    val baseKeys = Tables(spark, dir, "documents")
      .select(col("doc_id").as("k"))
    // the testdata table is a single parquet FILE; the file-source
    // stream wants a landing DIRECTORY — stage a copy
    val landing = java.nio.file.Files
      .createTempDirectory("graft-merge-stream").toString
    Tables(spark, dir, "documents")
      .write.mode("overwrite").parquet(s"$landing/documents.parquet")
    val docStream = StreamingOps
      .readDocumentsStream(spark, s"$landing/documents.parquet")
      .select("doc_id", "text")
    val q = StreamingOps
      .classifiedUpdates(graft.queries.Text.mergeUpdates(docStream), baseKeys)
      .writeStream.format("memory").queryName("merge_classify_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val got = spark.table("merge_classify_stream")
      .groupBy("action")
      .agg(count(lit(1)).as("n_rows"), sum("k").as("id_sum"))
      .collect()
      .map(r => (r.getAs[String]("action"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("id_sum"))).toSet
    val batch = graft.queries.Text.pipelineMergeSnapshot(spark, dir)
      .filter(col("action") =!= "unchanged")
      .select("action", "n_rows", "id_sum")
      .collect()
      .map(r => (r.getAs[String]("action"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("id_sum"))).toSet
    assert(got == batch, s"streamed $got != batch $batch")
  }

  test("streaming media-frame dedup flags exactly the batch duplicate frames") {
    // no natural cross-carve byte-identical media exist (measured), so
    // the landing batch is planted: doc 100 copies base doc 3's text
    // (all 4 frames duplicate), doc 105 is new (no frame matches)
    val sf = "/root/testdata/sf0.001"
    val spark2 = spark
    import spark2.implicits._
    val base3 = Tables(spark, sf, "documents")
      .filter(col("doc_id") === 3).select("text").collect().head.getString(0)
    val landing = java.nio.file.Files
      .createTempDirectory("graft-media-stream").toString
    Seq((100L, base3, "en", "src1"),
        (105L, "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8", "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$landing/documents.parquet")
    val baseKeys = StreamingOps.baseFrameKeys(spark, sf)
    val q = StreamingOps.dupMediaFrames(
        StreamingOps.readDocumentsStream(spark, s"$landing/documents.parquet"),
        baseKeys)
      .writeStream.format("memory").queryName("media_dedup_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val streamed = spark.table("media_dedup_stream").collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("frame_idx"))).toSet
    assert(streamed == Set((100L, 0), (100L, 1), (100L, 2), (100L, 3)),
      s"the copied media's 4 frames and nothing else must flag: $streamed")
    // batch twin over the same landing batch agrees row for row
    val batch = StreamingOps.dupMediaFrames(
        spark.read.parquet(s"$landing/documents.parquet"), baseKeys)
      .collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("frame_idx"))).toSet
    assert(batch == streamed)
  }

  test("streaming temporal-align: a landing trimmed re-cut streams its candidates and compacts to the batch answer") {
    // the MultimodalSpec re-cut fixture split across the stream/static
    // boundary: the ORIGINAL lives in the standing corpus (base carve),
    // the RE-CUT lands as a stream; candidate shingle hits stream out,
    // compaction folds them through the identical offset/run rollup
    val spark2 = spark
    import spark2.implicits._
    def b(i: Int) = f"block$i%03d" // 8 chars
    val m1 = (0 to 15).map(b).mkString // original: blocks B0..B15
    // re-cut: two junk frames prepended, first 14 blocks kept — matches
    // at offset ia − ib = −2 with a = base id 1 < b = landing id 100
    val m2 = (Seq("junkblk1", "junkblk2") ++ (0 to 13).map(b)).mkString
    val filler = (200 to 215).map(b).mkString
    assert(Seq(m1, m2, filler).forall(_.length == 128))
    val baseDir = java.nio.file.Files
      .createTempDirectory("graft-align-base").toString
    Seq((1L, m1), (2L, filler))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$baseDir/documents.parquet")
    val landing = java.nio.file.Files
      .createTempDirectory("graft-align-stream").toString
    Seq((100L, m2))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$landing/documents.parquet")
    val (baseShingles, baseFrames) = StreamingOps.alignBaseSides(spark, baseDir)
    val q = StreamingOps.alignCandidates(
        StreamingOps.readDocumentsStream(spark, s"$landing/documents.parquet"),
        baseShingles)
      .writeStream.format("memory").queryName("align_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val streamed = spark.table("align_stream")
    // one candidate row per shared shingle: the 12 shingles of the kept
    // 14-block run, all pointing at the original
    val cands = streamed.collect()
      .map(r => (r.getAs[Long]("landing_media_id"),
        r.getAs[Long]("base_media_id")))
    assert(cands.length == 12 && cands.forall(_ == ((100L, 1L))),
      s"expected 12 (100,1) shingle hits: ${cands.toSeq}")
    // compaction over the drained log ≡ the batch operator on the
    // combined corpus (restricted to pairs the stream can see)
    val compacted = StreamingOps.alignCompaction(streamed,
      spark.read.parquet(s"$landing/documents.parquet"), baseFrames)
      .collect()
    val batch = graft.multimodal.Multimodal.temporalAlign(
        graft.multimodal.Multimodal.fromDocuments(
          Seq((1L, m1), (2L, filler), (100L, m2)).toDF("doc_id", "text"),
          graft.multimodal.Multimodal.alignFrames))
      .filter(col("media_b") === 100L).collect()
    assert(compacted.toSeq.map(_.toSeq) == batch.toSeq.map(_.toSeq),
      s"streamed+compacted ${compacted.toSeq} != batch ${batch.toSeq}")
    val r = compacted.head
    assert(r.getAs[Long]("media_a") == 1L && r.getAs[Long]("media_b") == 100L)
    assert(r.getAs[Long]("offset") == -2L &&
      r.getAs[Long]("longest_run") == 14L &&
      r.getAs[Long]("n_aligned") == 14L)
  }

  test("streaming version-log append: stream-carved events equal the batch carve and serve the same state") {
    val spark2 = spark
    import spark2.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-tt-stream").toString
    // the TimeTravelSpec planted corpus: batch 1 revises 0 and 27,
    // inserts -1, tombstones 56
    Seq((0L, "t0"), (8L, "t8"), (27L, "t27"), (56L, "t56"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val q = StreamingOps.ttDeltaEvents(
        StreamingOps.readDocumentsStream(spark, s"$d/documents.parquet"), 1)
      .writeStream.format("memory").queryName("tt_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val streamed = spark.table("tt_stream")
    val batch = graft.queries.Text.ttBatch(
      spark.read.parquet(s"$d/documents.parquet").select("doc_id", "text"), 1)
    assert(streamed.collect().map(_.toSeq).toSet ==
      batch.collect().map(_.toSeq).toSet,
      "stream-carved MERGE events drifted from the batch carve")
    assert(streamed.count() == 4) // revisions 0,27 + insert -1 + tombstone 56
    // append-only landing: the drained events become log partition
    // ver=1 beside the base snapshot; the identical last-writer-wins
    // read path must serve the batch log's v=1 state
    spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id").as("k"), col("text").as("new_text"),
        lit("upsert").as("op"))
      .write.mode("overwrite").parquet(s"$d/log/events/ver=0")
    streamed.write.mode("overwrite").parquet(s"$d/log/events/ver=1")
    val served = graft.queries.Text.stateAt(
        spark.read.parquet(s"$d/log/events"), 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(served == Map(0L -> "t0 [v1]", -1L -> "new v1: t0",
      8L -> "t8", 27L -> "t27 [v1]"),
      s"landed log served a drifted v=1 state: $served")
  }

  test("idempotent log append: re-delivering a batch replaces its partition, never duplicates it") {
    import graft.queries.Text
    val spark2 = spark
    import spark2.implicits._
    val d = java.nio.file.Files
      .createTempDirectory("graft-tt-idem").toString
    Seq((0L, "t0"), (8L, "t8"), (27L, "t27"), (56L, "t56"))
      .toDF("doc_id", "text")
      .select(col("doc_id").as("k"), col("text").as("new_text"),
        lit("upsert").as("op"))
      .write.mode("overwrite").parquet(s"$d/log/ver=0")
    val batch = Text.ttBatch(
      Seq((0L, "t0"), (8L, "t8"), (27L, "t27"), (56L, "t56"))
        .toDF("doc_id", "text"), 1)
    // deliver once, then REPLAY the same epoch (the failure-retry path)
    StreamingOps.ttIdempotentAppend(batch, s"$d/log", 1)
    val once = spark.read.parquet(s"$d/log").collect().map(_.toSeq).toSet
    StreamingOps.ttIdempotentAppend(batch, s"$d/log", 1)
    val twice = spark.read.parquet(s"$d/log").collect().map(_.toSeq).toSet
    assert(twice == once && once.size == 8, // 4 base + 4 batch-1 events
      "replaying the epoch must be a byte-level no-op")
    // ver=0 untouched by the dynamic overwrite; the served state is the
    // planted v1 state either way
    val served = Text.stateAt(spark.read.parquet(s"$d/log"), 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(served == Map(0L -> "t0 [v1]", -1L -> "new v1: t0",
      8L -> "t8", 27L -> "t27 [v1]"))
  }

  test("streaming CDC: landing tail events classify against the checkpoint and compact to the batch diff") {
    import graft.queries.Text
    val dir = "/root/testdata/sf0.001"
    val logBase = Text.ensureVersionLog(spark, dir)
    val ckBase = Text.ensureTtCheckpoint(spark, dir)
    val tailDir = java.nio.file.Files
      .createTempDirectory("graft-cdc-stream").toString
    spark.read.parquet(s"$logBase/events")
      .filter(col("ver") === Text.ttCheckpointVer + 1)
      .select("k", "new_text", "op")
      .write.mode("overwrite").parquet(s"$tailDir/events")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tailDir/events").schema)
      .parquet(s"$tailDir/events")
    val q = StreamingOps.cdcDeltaChanges(stream,
        spark.read.parquet(s"$ckBase/state"))
      .writeStream.format("memory").queryName("cdc_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val xor = Text.md5SignedHash64Expr _
    val rolled = spark.table("cdc_stream")
      .groupBy("change_type")
      .agg(count(lit(1)).as("n_rows"), sum("k").as("id_sum"),
        min("k").as("min_k"), max("k").as("max_k"),
        expr(s"bit_xor(${xor("old_hd")})").as("old_xor"),
        expr(s"bit_xor(${xor("new_hd")})").as("new_xor"))
      .orderBy("change_type").collect()
    val batch = Text.pipelineVersionDiff(spark, dir,
      Text.ttCheckpointVer, Text.ttCheckpointVer + 1).collect()
    assert(rolled.nonEmpty &&
      rolled.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq,
      s"streamed CDC rollup ${rolled.toSeq} != batch diff ${batch.toSeq}")
  }

  test("streaming PII scrub equals the batch projection per document") {
    val sf = "/root/testdata/sf0.01"
    val docsDir = java.nio.file.Files.createTempDirectory("docs-pii-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      docsDir.resolve("documents.parquet"))
    val q = StreamingOps
      .piiScrubbedDocs(StreamingOps.readDocumentsStream(spark, docsDir.toString))
      .writeStream.format("memory").queryName("pii_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_emails"),
        r.getAs[Int]("n_phones"), r.getAs[Int]("n_ips"),
        r.getAs[String]("hd"))).toSet
    val streamed = asSet(spark.table("pii_stream"))
    val batch = asSet(graft.queries.Text.piiScrub(Tables(spark, sf, "documents"))
      .select("doc_id", "n_emails", "n_phones", "n_ips", "hd"))
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed scrub (${streamed.size} docs) must equal batch")
    assert(streamed.exists(_._2 > 0) && streamed.exists(_._3 > 0) &&
      streamed.exists(_._4 > 0), "every planted PII kind must fire")
  }

  test("streaming gopher quality gate equals the batch flags per document") {
    val sf = "/root/testdata/sf0.01"
    val docsDir = java.nio.file.Files.createTempDirectory("docs-gopher-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      docsDir.resolve("documents.parquet"))
    val q = StreamingOps
      .gopherFlaggedDocs(StreamingOps.readDocumentsStream(spark, docsDir.toString))
      .writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("fail_word_count"), r.getAs[Long]("fail_mean_len"),
        r.getAs[Long]("fail_symbol"), r.getAs[Long]("fail_alpha"),
        r.getAs[Long]("fail_stop"))).toSet
    val streamed = asSet(spark.table("gopher_stream"))
    val batch = asSet(
      graft.queries.Text.gopherFlags(Tables(spark, sf, "documents"))
        .select("doc_id", "n_words", "fail_word_count", "fail_mean_len",
          "fail_symbol", "fail_alpha", "fail_stop"))
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed gopher flags (${streamed.size} docs) must equal batch")
  }

  test("streaming normalize equals the batch projection per document") {
    val sf = "/root/testdata/sf0.01"
    val docsDir = java.nio.file.Files.createTempDirectory("docs-clean-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      docsDir.resolve("documents.parquet"))
    val q = StreamingOps
      .cleanedDocs(StreamingOps.readDocumentsStream(spark, docsDir.toString))
      .writeStream.format("memory").queryName("clean_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_ctrl"),
        r.getAs[Int]("n_space_runs"), r.getAs[Int]("n_nl_runs"),
        r.getAs[String]("hd"))).toSet
    val streamed = asSet(spark.table("clean_stream"))
    val batch = asSet(
      graft.queries.Text.cleanNormalize(Tables(spark, sf, "documents"))
        .select("doc_id", "n_ctrl", "n_space_runs", "n_nl_runs", "hd"))
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed normalize (${streamed.size} docs) must equal batch")
    assert(streamed.exists(_._2 > 0) && streamed.exists(_._3 > 0) &&
      streamed.exists(_._4 > 0), "every planted dirt kind must fire")
  }

  test("streaming boilerplate strip accounting equals the batch join per document") {
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-boiler-base").toString
    val landing = java.nio.file.Files.createTempDirectory("graft-boiler-land").toString
    val header = (1 to 20).map(i => s"h$i").mkString(" ")
    def body(tag: String) = (1 to 20).map(i => s"$tag$i").mkString(" ")
    def write(rows: Seq[(Long, String, String, String)], dir: String) =
      rows.toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // base corpus establishes the srcA header as boilerplate (df = 2)
    write(Seq(
      (1L, s"$header ${body("a")}", "en", "srcA"),
      (2L, s"$header ${body("b")}", "en", "srcA")), base)
    // landing delta: one doc repeating the header, one clean
    write(Seq(
      (10L, s"$header ${body("x")}", "en", "srcA"),
      (11L, s"${body("y")} ${body("z")}", "en", "srcA")), landing)
    val blocks = graft.queries.Text.boilerplateBlocks(spark, base)
    val q = StreamingOps.boilerplateFlaggedDocs(
        StreamingOps.readDocumentsStream(spark, s"$landing/documents.parquet"),
        blocks)
      .writeStream.format("memory").queryName("boiler_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_paras"),
        r.getAs[Long]("n_boiler_paras"), r.getAs[Long]("n_tokens_kept"),
        r.getAs[Long]("n_tokens_stripped"))).toSet
    val streamed = asSet(spark.table("boiler_stream"))
    val batch = asSet(StreamingOps.boilerplateFlaggedDocs(
      spark.read.parquet(s"$landing/documents.parquet"), blocks))
    assert(streamed == batch && streamed.size == 2, s"stream $streamed vs batch $batch")
    assert(streamed.contains((10L, 2L, 1L, 20L, 20L)),
      "the landing header doc must strip its boilerplate block")
    assert(streamed.contains((11L, 2L, 0L, 40L, 0L)),
      "the clean landing doc must pass untouched")
  }

  test("streaming expectations gate: rules fire at ingest, stream equals batch") {
    val spark2 = spark
    import spark2.implicits._
    val landing = java.nio.file.Files
      .createTempDirectory("graft_expect_stream").toString
    def tok(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // one row per violation class, one multi-violation row, one clean row
    Seq(
      (1L, tok(10), "en", "srcA"), // clean
      (2L, "", "en", "srcA"), // blanked text, stale n_chars: both text rules
      (3L, tok(10), "xx", "srcA"), // unknown lang
      (4L, tok(10), "de", "srcA"), // chars corrupted below
      (5L, "", "xx", "srcA")) // everything at once
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", when(col("doc_id") === 4L, lit(9999L))
        .when(col("doc_id") === 2L || col("doc_id") === 5L, lit(42L))
        .otherwise(length(col("text")).cast("long")))
      .write.mode("overwrite").parquet(s"$landing/documents.parquet")
    val q = StreamingOps.validatedDocs(
        StreamingOps.readDocumentsStream(spark, s"$landing/documents.parquet"))
      .writeStream.format("memory").queryName("expect_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("violations"),
        r.getAs[Boolean]("quarantined"))).toSet
    val streamed = asSet(spark.table("expect_stream"))
    val batch = asSet(StreamingOps.validatedDocs(
      spark.read.parquet(s"$landing/documents.parquet")))
    assert(streamed == batch && streamed.size == 5,
      s"stream $streamed vs batch $batch")
    assert(streamed.contains((1L, "", false)), "clean row must pass")
    assert(streamed.contains((3L, "allowed_lang", true)))
    assert(streamed.contains((4L, "chars_consistent", true)))
    assert(streamed.contains(
      (2L, "chars_consistent,nonempty_text", true)),
      "blank text must trip both text rules in rule order")
    assert(streamed.contains(
      (5L, "allowed_lang,chars_consistent,nonempty_text", true)),
      "the all-rules row must carry every tag")
  }

  test("streaming vector admission: exact copies rejected, novel vectors admitted, stream equals batch") {
    import graft.queries.Similarity
    val sf = "/root/testdata/sf0.01"
    val cents = Similarity.ivfCentroidLiterals(spark, sf)
    val members = Similarity.ivfMembers(spark, sf)
    // landing batch: exact COPIES of standing vectors under fresh ids
    // (cosine 1 in their own cell -> must be rejected at tau = 0.95) and
    // REVERSED vectors (new geometry in this concentrated corpus, far
    // from every member -> must be admitted)
    val base = Tables(spark, sf, "embeddings")
    val copies = base.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"),
        col("label"))
    val novel = base.filter(col("vec_id") % 50 === 1)
      .select((col("vec_id") + 2000000L).as("vec_id"),
        expr("transform(sequence(1, 64), i -> embedding[64 - i])")
          .as("embedding"), col("label"))
    val landing = copies.unionByName(novel)
    val landingDir = java.nio.file.Files.createTempDirectory("vec-landing")
    landing.coalesce(1).write.mode("overwrite")
      .parquet(landingDir.toString + "/batch1")
    val q = StreamingOps.novelVectors(
        StreamingOps.readEmbeddingsStream(spark, landingDir.toString + "/batch1"),
        cents, members, tau = 0.95)
      .writeStream.format("memory").queryName("vec_admission")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val streamed = spark.table("vec_admission").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"))).toSet
    val batch = StreamingOps.novelVectors(
        spark.read.schema(StreamingOps.embeddingsSchema)
          .parquet(landingDir.toString + "/batch1"),
        cents, members, tau = 0.95)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"))).toSet
    assert(streamed == batch, "streamed admission must equal batch")
    assert(streamed.forall(_._1 >= 2000000L), "an exact copy was admitted")
    val nNovel = novel.count()
    assert(streamed.size == nNovel,
      s"expected all $nNovel novel vectors admitted, got ${streamed.size}")
  }

  test("streamed chunking equals the batch chunk projection") {
    val sf = "/root/testdata/sf0.001"
    val docsDir = java.nio.file.Files.createTempDirectory("docs-chunk-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      docsDir.resolve("documents.parquet"))
    val stream = StreamingOps.readDocumentsStream(spark, docsDir.toString)
    val q = StreamingOps.chunkedDocs(stream)
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val key = Seq("doc_id", "start")
    val streamed = spark.table("chunk_stream")
      .orderBy(key.map(col): _*).collect().toSeq
    val batch = StreamingOps.chunkedDocs(Tables(spark, sf, "documents"))
      .orderBy(key.map(col): _*).collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed chunks diverge from batch (${streamed.length} vs ${batch.length})")
  }

  test("sequence detection fires across a micro-batch boundary") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double)]
    val events = input.toDF()
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val q = StreamingOps.sequenceMatches(events)
      .writeStream.format("memory").queryName("seq_stream")
      .outputMode("append").start()
    // batch 1: view + click for user 1 — no emission yet
    input.addData(
      (1L, 10L, ts("2024-01-01 01:00:00"), "view", 1.0),
      (1L, 11L, ts("2024-01-01 02:00:00"), "click", 2.0),
      // user 2: trigram broken by an interleaved error
      (2L, 20L, ts("2024-01-01 01:00:00"), "view", 1.0),
      (2L, 21L, ts("2024-01-01 01:30:00"), "error", 0.0))
    q.processAllAvailable()
    assert(spark.table("seq_stream").count() == 0L,
      "no trigram is complete after batch 1")
    // batch 2: the purchase lands — the straddling trigram must fire
    // from state; user 2's click+purchase must not (view was displaced)
    input.addData(
      (1L, 12L, ts("2024-01-01 03:00:00"), "purchase", 30.25),
      (2L, 22L, ts("2024-01-01 02:00:00"), "click", 2.0),
      (2L, 23L, ts("2024-01-01 02:30:00"), "purchase", 99.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("seq_stream").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_ts_us"),
        r.getAs[Long]("purchase_cents"))).toSeq
    assert(rows == Seq((1L,
      ts("2024-01-01 01:00:00").getTime * 1000L, 3025L)), s"$rows")
  }

  test("erasure requests screen against every standing surface at ingest") {
    import org.apache.spark.sql.streaming.Trigger
    val sf = "/root/testdata/sf0.001"
    val tombDir = java.nio.file.Files
      .createTempDirectory("graft-gdpr-stream").toString
    graft.queries.Text.gdprTombstones(spark, sf)
      .write.mode("overwrite").parquet(s"$tombDir/ids")
    val stream = spark.readStream.schema("doc_id LONG")
      .parquet(s"$tombDir/ids")
    val q = StreamingOps.erasureRefCounts(stream, spark, sf)
      .writeStream.format("memory").queryName("gdpr_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(180000), "stream did not drain within timeout")
    val streamed = spark.table("gdpr_stream").collect()
      .map(r => r.getAs[String]("surface") -> r.getAs[Long]("n_refs"))
      .toMap
    // batch recount with the same reference semantics, per (surface, col)
    val tomb = graft.queries.Text.gdprTombstones(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val bm = graft.queries.Text.ensureBm25Index(spark, sf)
    val cc = graft.queries.Text.ensureCcBase(spark, sf)
    def refs(df: org.apache.spark.sql.DataFrame, c: String): Long =
      df.select(c).collect().count(r => tomb(r.getLong(0))).toLong
    val expected = Map(
      "corpus" -> refs(Tables(spark, sf, "documents"), "doc_id"),
      "fuzzy_bands" -> refs(spark.table("graft_fuzzy_bands_bq"), "doc_id"),
      "fuzzy_sh" -> refs(spark.table("graft_fuzzy_sh_bq"), "doc_id"),
      "bm25_postings" -> refs(spark.read.parquet(s"$bm/postings"), "doc_id"),
      "bm25_doclens" -> refs(spark.read.parquet(s"$bm/doclens"), "doc_id"),
      "cc_edges_a" -> refs(spark.read.parquet(s"$cc/edges"), "id_a"),
      "cc_edges_b" -> refs(spark.read.parquet(s"$cc/edges"), "id_b"),
      "cc_labels_member" -> refs(spark.read.parquet(s"$cc/labels"), "id"),
      "cc_labels_component" ->
        refs(spark.read.parquet(s"$cc/labels"), "component"))
      .filter(_._2 > 0)
    assert(streamed == expected,
      s"streamed $streamed != batch-recounted $expected")
    assert(streamed("corpus") == tomb.size.toLong)
  }

  test("event-time-timeout sessionizer equals the hand split and the batch rollup") {
    val sf = "/root/testdata/sf0.001"
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapUs = 10L * 60L * 1000000L
    val evs = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[java.sql.Timestamp]("ts")))
    val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val events = input.toDF().toDF("user_id", "event_id", "ts")
    val q = StreamingOps.timedOutSessions(events)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    input.addData(evs.toSeq)
    q.processAllAvailable()
    // push the watermark far past every open session with a sentinel
    val maxTs = evs.map(_._3.getTime).max
    input.addData(Seq((-1L, -1L, new java.sql.Timestamp(maxTs + 86400000L))))
    q.processAllAvailable()
    // one more empty-ish advance so the sentinel batch's watermark fires
    input.addData(Seq((-1L, -2L, new java.sql.Timestamp(maxTs + 2 * 86400000L))))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_stream").collect()
      .filter(_.getAs[Long]("user_id") >= 0)
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start_us"),
        r.getAs[Long]("session_end_us"), r.getAs[Long]("n_events"))).toSet
    // hand split: sorted per user, new session at gap >= 10 min
    // (micros = epoch-seconds + full nanos — getTime alone drops sub-ms)
    def micros(t: java.sql.Timestamp): Long =
      (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
    val expected = evs.groupBy(_._1).flatMap { case (uid, rows) =>
      val ts = rows.map(r => (micros(r._3), r._2))
        .sortBy(identity).map(_._1)
      val sessions = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)]
      var start = ts.head; var last = ts.head; var n = 1L
      ts.tail.foreach { t =>
        if (t - last < gapUs) { last = t; n += 1 }
        else { sessions += ((uid, start, last + gapUs, n))
          start = t; last = t; n = 1L }
      }
      sessions += ((uid, start, last + gapUs, n))
      sessions
    }.toSet
    assert(streamed == expected,
      s"missing ${expected -- streamed}, extra ${streamed -- expected}")
    // triangulate against the built-in session_window rollup
    val batch = graft.queries.Events.evSessionWindow(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"),
          r.getAs[Long]("max_session_events"))).toMap
    streamed.groupBy(_._1).foreach { case (uid, ss) =>
      val (nS, nE, mx) = batch(uid)
      assert(ss.size.toLong == nS, s"user $uid session count")
      assert(ss.toSeq.map(_._4).sum == nE, s"user $uid event count")
      assert(ss.map(_._4).max == mx, s"user $uid max session")
    }
  }

  test("attribution credits fire at conversion across a micro-batch boundary") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double)]
    val events = input.toDF()
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val q = StreamingOps.attributedCredits(events)
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").start()
    // batch 1: two touches, no conversion — the journey stays open in state
    input.addData(
      (1L, 10L, ts("2024-01-01 01:00:00"), "view", 0.0),
      (1L, 11L, ts("2024-01-01 02:00:00"), "click", 0.0),
      (1L, 12L, ts("2024-01-01 02:30:00"), "error", 0.0)) // never credits
    q.processAllAvailable()
    assert(spark.table("attr_stream").count() == 0L,
      "credits must not emit before the conversion")
    // batch 2: the purchase lands — the straddling journey credits 50/50
    input.addData(
      (1L, 13L, ts("2024-01-01 03:00:00"), "purchase", 9.99),
      (1L, 14L, ts("2024-01-01 04:00:00"), "signup", 0.0)) // trailing, drops
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("attr_stream").collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[Int]("idx"),
        r.getAs[Long]("linear_ppm"), r.getAs[Long]("ushape_ppm"),
        r.getAs[Boolean]("first"), r.getAs[Boolean]("last"))).sortBy(_._2)
    assert(rows.toSeq == Seq(
      ("view", 1, 500000L, 500000L, true, false),
      ("click", 2, 500000L, 500000L, false, true)), s"${rows.toSeq}")
  }

  test("attribution journey caps per-user state keeping both U-shape anchors") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, Long, java.sql.Timestamp, String, Double)]
    val events = input.toDF()
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val q = StreamingOps.attributedCredits(events, maxTouches = 3)
      .writeStream.format("memory").queryName("attr_capped")
      .outputMode("append").start()
    // five touches against a cap of 3: each overflow drops the SECOND
    // retained touch (oldest middle), so the journey ends as
    // [t1=view, t4=click, t5=view] — the first touch (U-shape 40%
    // anchor) and the freshest tail survive
    input.addData(
      (1L, 10L, ts("2024-01-01 01:00:00"), "view", 0.0),
      (1L, 11L, ts("2024-01-01 01:10:00"), "click", 0.0),
      (1L, 12L, ts("2024-01-01 01:20:00"), "signup", 0.0),
      (1L, 13L, ts("2024-01-01 01:30:00"), "click", 0.0),
      (1L, 14L, ts("2024-01-01 01:40:00"), "view", 0.0),
      (1L, 15L, ts("2024-01-01 02:00:00"), "purchase", 5.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("attr_capped").collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[Int]("idx"),
        r.getAs[Long]("linear_ppm"), r.getAs[Long]("ushape_ppm"),
        r.getAs[Boolean]("first"), r.getAs[Boolean]("last"))).sortBy(_._2)
    assert(rows.toSeq == Seq(
      ("view", 1, 333333L, 400000L, true, false),
      ("click", 2, 333333L, 200000L, false, false),
      ("view", 3, 333334L, 400000L, false, true)), s"${rows.toSeq}")
  }

  test("streamed attribution credits fold to the batch ev_attribution rollup") {
    val sf = "/root/testdata/sf0.001"
    val stream = StreamingOps.readEventsStream(spark, eventsDir)
    val q = StreamingOps.attributedCredits(stream)
      .writeStream.format("memory").queryName("attr_equality")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val streamed = spark.table("attr_equality")
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(when(col("first"), 1L).otherwise(0L)).as("n_first"),
        sum(when(col("last"), 1L).otherwise(0L)).as("n_last"),
        sum(when(col("first"), 1000000L).otherwise(0L))
          .as("first_touch_ppm"),
        sum(when(col("last"), 1000000L).otherwise(0L)).as("last_touch_ppm"),
        sum("linear_ppm").as("linear_ppm"),
        sum("ushape_ppm").as("ushape_ppm"))
      .orderBy("channel").collect().map(_.toSeq)
    val batch = graft.queries.Events.evAttribution(spark, sf).collect()
      .map(_.toSeq)
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq,
      s"streamed ${streamed.toSeq} != batch ${batch.toSeq}")
  }

  test("streamed sequence matches fold to the batch ev_sequence_detect rows") {
    val sf = "/root/testdata/sf0.001"
    val stream = StreamingOps.readEventsStream(spark, eventsDir)
    val q = StreamingOps.sequenceMatches(stream)
      .writeStream.format("memory").queryName("seq_equality")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val streamed = spark.table("seq_equality")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_matches"),
        expr("timestamp_micros(min(start_ts_us))").as("first_match_ts"),
        (sum("purchase_cents").cast("double") / 100.0d).as("purchase_value"))
      .orderBy("user_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_matches"),
        r.getAs[java.sql.Timestamp]("first_match_ts"),
        r.getAs[Double]("purchase_value")))
    val batch = graft.queries.Events.evSequenceDetect(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_matches"),
        r.getAs[java.sql.Timestamp]("first_match_ts"),
        r.getAs[Double]("purchase_value")))
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq,
      s"streamed ${streamed.toSeq} != batch ${batch.toSeq}")
  }
}
