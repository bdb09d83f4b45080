package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events stream.
  *
  * The reference is pure batch (SURVEY.md §2.10); this module adds the
  * streaming semantics a production deployment of the same pipeline needs.
  * Every windowed transform here is a plain `DataFrame => DataFrame`
  * applied identically under `read` and `readStream` — the batch runs in
  * `graft.queries.Events` double as the oracle-checked semantics of the
  * streaming jobs, and the specs execute the same plans through
  * `readStream → memory sink` with an availableNow trigger.
  */
object StreamingOps {

  /** events schema for readStream with `ts` declared as `tsType` (files
    * need the schema up front; the physical encoding varies by testdata
    * generation — see graft.Tables.apply).
    */
  private def eventsRawSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over an events parquet directory.
    *
    * The declared `ts` type is probed from the files' footers with a batch
    * schema read (no job runs), so the stream handles both events
    * encodings — legacy TIMESTAMP(NANOS)-as-long and TIMESTAMP(MICROS)
    * NTZ — and normalizes exactly like the batch loader
    * (graft.Tables.normalizeEventsTs), keeping stream/batch twins aligned.
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    // ADVICE r7-2: the batch probe throws "Unable to infer schema" when the
    // source directory is empty / has no parquet yet — a normal starting
    // state for a file stream. Fall back to the legacy nanos-as-long
    // encoding (what the static-schema version of this reader assumed);
    // files arriving later with the other encoding would be a mid-stream
    // schema change no file source supports anyway. ADVICE r8-3: only the
    // schema-inference AnalysisException selects the fallback — any other
    // probe failure (permissions, corrupt footer, IO) must surface, not
    // silently pick an encoding.
    val tsType =
      try spark.read.parquet(dir).schema("ts").dataType
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage != null &&
              (e.getMessage.contains("Unable to infer schema") ||
                e.getMessage.contains("Path does not exist") ||
                e.getMessage.contains("PATH_NOT_FOUND") ||
                e.getMessage.contains("UNABLE_TO_INFER_SCHEMA")) =>
          LongType
      }
    graft.Tables.normalizeEventsTs(
      spark.readStream.schema(eventsRawSchema(tsType)).parquet(dir))
  }

  /** Watermarked tumbling 1-hour aggregate per event type. On a stream the
    * watermark bounds state and admits late data up to `lateness`; on a
    * batch frame `withWatermark` is a no-op, so batch and stream results
    * coincide once the stream is drained.
    */
  def tumblingCounts(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sum_value_cents"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value_cents"))

  /** Watermarked per-user session windows (10-minute gap) — distributed
    * sessionization with state partitioned by user, the streaming twin of
    * `graft.queries.Events.evSessionWindow`.
    */
  def sessionCounts(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Stream-stream interval join: purchases matched to the same user's
    * view events from the preceding hour. Both sides carry watermarks so
    * the join state is bounded — Spark drops buffered view rows once the
    * purchase-side watermark passes the interval's upper bound. Works
    * identically on batch frames (watermarks become no-ops).
    */
  def purchaseViewJoin(purchases: DataFrame, views: DataFrame,
      lateness: String = "1 hour"): DataFrame = {
    val p = purchases.withWatermark("ts", lateness)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    val v = views.withWatermark("ts", lateness)
      .select(col("user_id").as("v_user_id"), col("ts").as("view_ts"))
    p.join(v,
      col("user_id") === col("v_user_id") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select("purchase_id", "user_id", "purchase_ts", "purchase_value", "view_ts")
  }

  /** Watermarked streaming exact-dedup by event id — the exactly-once
    * ingestion guard in front of every downstream aggregate (and the
    * streaming member of the dedup family in graft.queries.Text).
    * `dropDuplicatesWithinWatermark` keeps only watermark-bounded state:
    * a duplicate arriving within `lateness` of the original is dropped,
    * and the key's state is evicted once the watermark passes — unlike
    * plain `dropDuplicates`, whose streaming state grows without bound.
    * On a batch frame the watermark is a no-op and the result is plain
    * distinct-by-key, so batch and drained-stream results coincide
    * (asserted by StreamingSpec).
    */
  def dedupedEvents(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", lateness)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** documents schema for readStream (file sources need it declared). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a documents parquet directory — the shape of
    * a continuously-landing crawl: each newly arrived file becomes a
    * micro-batch.
    */
  def readDocumentsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(documentsSchema).parquet(dir)

  /** embeddings schema for readStream (file sources need it declared). */
  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** File-source stream over an embeddings parquet directory — landing
    * vectors from an upstream encoder, the vector-lake half of the
    * continuously-landing crawl.
    */
  def readEmbeddingsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(embeddingsSchema).parquet(dir)

  /** Streaming vector admission — SemDeDup-at-ingest over the STANDING
    * IVF index: each landing vector is cell-assigned by the index's own
    * frozen-quantizer argmin rule (the [[graft.queries.Similarity]]
    * assignment text, with the bounded centroid set riding along as a
    * LITERAL — the qualityScoredDocs weights treatment, because the
    * scalar-subquery splice the batch assignment uses is not available
    * to the streaming planner), then admitted only when NO standing
    * member of its cell lies within cosine `tau` — ONE stateless
    * stream-static LEFT ANTI join. No watermark, no state store; the
    * blocking key is the index's own cell layout, so at scale the anti
    * join touches nlist-th of the corpus per landing vector, exactly
    * like every other probe of the standing index. Batch/stream
    * equality is StreamingSpec-pinned (shared definition — this method
    * runs unchanged on a batch frame).
    */
  def novelVectors(landing: DataFrame,
      cents: Seq[(Long, Seq[Double], Double)], members: DataFrame,
      tau: Double): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(landing.sparkSession)
    val d = graft.queries.Similarity.dims
    val assigned = landing
      .withColumn("vnorm", expr("sqrt(float_dot(embedding, embedding))"))
      .withColumn("cents", typedLit(cents))
      .withColumn("cell", expr(
        s"""array_min(transform(cents, c -> named_struct(
              'neg_cos', -(aggregate(sequence(0, ${d - 1}), 0D,
                (acc, i) -> acc + CAST(embedding[i] AS DOUBLE) * c._2[i]) / (vnorm * c._3)),
              'c_label', c._1))).c_label"""))
      .drop("cents")
    val mem = members.select(col("cell").as("m_cell"), col("m_vec"),
      col("m_norm"))
    assigned.join(mem,
        col("cell") === col("m_cell") &&
          expr("float_dot(embedding, m_vec)") /
            (col("vnorm") * col("m_norm")) >= tau,
        "left_anti")
      .select("vec_id", "cell")
  }

  /** Stream-STATIC enrichment join: a stream joined to a bounded
    * dimension on an equality key — the remaining §2.10 join shape
    * (stream-stream interval join is [[purchaseViewJoin]]). The static
    * side is re-planned every micro-batch (it may be a slowly-refreshed
    * table) and broadcast when small; the stream side stays stateless —
    * no watermark needed because nothing is buffered.
    *
    * Instance: purchases enriched with per-user lifetime stats computed
    * in batch — the reference's ticker-attach broadcast join
    * (`wrds_ingestion.py:659-668`) transplanted onto a stream.
    */
  def enrichedPurchases(events: DataFrame, userStats: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .join(userStats, Seq("user_id"), "left")

  /** Streaming decontamination (the stream twin of
    * `graft.queries.Text.txDecontaminate`): each micro-batch's documents
    * are shingled and LEFT SEMI joined against the STATIC benchmark
    * shingle set, emitting flagged doc ids. Stateless by design — a doc
    * re-emits if it spans micro-batches or matches in several files, so
    * delivery is at-least-once and the exactly-once view belongs to the
    * idempotent sink (or a `dropDuplicatesWithinWatermark` when an
    * event-time column exists; plain streaming `dropDuplicates` would
    * grow state without bound). A doc matching k distinct shingles emits
    * k rows (the semi join dedups per exploded row, not per doc) — the
    * spec compares DISTINCT flagged ids against the batch oracle.
    */
  def contaminatedDocs(docsStream: DataFrame, benchShingles: DataFrame,
      width: Int = 8): DataFrame =
    docsStream
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= width)
      .select(col("doc_id"), col("lang"),
        explode(expr(graft.queries.Text.shingleExpr(width))).as("g"))
      .join(benchShingles, Seq("g"), "left_semi")
      .select("doc_id", "lang")

  /** [[contaminatedDocs]] over 60-bit md5-derived shingle keys — the
    * stream twin of [[graft.queries.Text.txDecontaminateHashed]], as the
    * string form twins `txDecontaminate`: the stream-static semi-join
    * ships 8-byte longs instead of ~50-byte gram strings, the form whose
    * state and shuffle survive a 100 TB backfill replay. Same
    * at-least-once posture as the string variant.
    */
  def contaminatedDocsHashed(docsStream: DataFrame, benchKeys: DataFrame,
      width: Int = 8): DataFrame =
    docsStream
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= width)
      .select(col("doc_id"), col("lang"),
        explode(expr(graft.queries.Text.shingleExpr(width))).as("g"))
      .select(col("doc_id"), col("lang"),
        expr("CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT)").as("gk"))
      .join(benchKeys, Seq("gk"), "left_semi")
      .select("doc_id", "lang")

  /** The static benchmark key set for [[contaminatedDocsHashed]]. */
  def benchmarkShingleKeys(spark: SparkSession, dir: String,
      benchmarkSource: String = "src0", width: Int = 8): DataFrame =
    benchmarkShingles(spark, dir, benchmarkSource, width)
      .select(expr("CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT)").as("gk"))
      .distinct()

  /** The static benchmark shingle set for [[contaminatedDocs]] — distinct
    * `width`-gram shingles of one source's documents, computed in batch.
    */
  def benchmarkShingles(spark: SparkSession, dir: String,
      benchmarkSource: String = "src0", width: Int = 8): DataFrame =
    graft.Tables(spark, dir, "documents")
      .filter(col("source") === benchmarkSource)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= width)
      .select(explode(expr(graft.queries.Text.shingleExpr(width))).as("g"))
      .distinct()

  /** Streaming FUZZY decontamination (the stream twin of
    * `graft.queries.Text.txFuzzyDecontaminate`, as [[contaminatedDocs]]
    * twins the exact pass): each micro-batch's documents compute their
    * minhash band keys and shingle sets in-stream, candidates come from
    * an equality join against the STATIC benchmark band table, and the
    * exact-Jaccard confirm joins the STATIC benchmark shingle sets — two
    * stateless stream-static joins, no stream-stream self-join, no
    * watermark (nothing is buffered). The shingle set rides along the
    * band explode precisely to avoid re-joining the stream to itself.
    * At-least-once like the exact twin: a doc sharing several bands with
    * several benchmark docs emits once per confirmed (doc, bench) pair —
    * the spec compares DISTINCT ids against the batch operator.
    */
  def fuzzyContaminatedDocs(docsStream: DataFrame, benchBands: DataFrame,
      benchShingles: DataFrame, numSlots: Int = 16, bandSize: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    graft.functions.TextFunctions.ensureRegistered(docsStream.sparkSession)
    val d = docsStream
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", expr(graft.queries.Text.shingleExpr(3)))
      .withColumn("bands", expr(s"minhash_bands(toks, 3, $numSlots, $bandSize)"))
      .select(col("doc_id"), col("lang"), col("sh"), posexplode(col("bands")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    d.join(benchBands, Seq("band", "key", "lang"))
      .join(benchShingles, Seq("bench_id"))
      .withColumn("inter", expr("size(array_intersect(sh, sh_b))"))
      .filter(col("inter").cast("double") /
        (expr("size(sh)") + expr("size(sh_b)") - col("inter")) >= threshold)
      .select("doc_id", "lang", "bench_id")
  }

  /** Streaming half of [[graft.queries.Text.ddCcIncremental]]: landing
    * delta documents probe the STANDING fuzzy band/shingle tables
    * (stream-static joins — the [[fuzzyContaminatedDocs]] shape) and
    * emit confirmed (delta_id, base_id) near-dup EDGES at ingest.
    * Folding the distinct streamed edges — plus the within-batch pairs,
    * a compaction-time batch job — into the standing star(base) labels
    * through the CC contraction IS the incremental relabel; the spec
    * pins streamed edges + contraction ≡ the batch incremental. A doc
    * matching through several bands emits once per (band, base) hit —
    * consumers take DISTINCT pairs, exactly like the decontamination
    * twin.
    */
  def ccDeltaBaseEdges(docsStream: DataFrame, baseBands: DataFrame,
      baseShingles: DataFrame, numSlots: Int = 16, bandSize: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    graft.functions.TextFunctions.ensureRegistered(docsStream.sparkSession)
    val d = docsStream
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", expr(graft.queries.Text.shingleExpr(3)))
      .withColumn("bands", expr(s"minhash_bands(toks, 3, $numSlots, $bandSize)"))
      .select(col("doc_id"), col("lang"), col("sh"), posexplode(col("bands")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    d.join(baseBands, Seq("band", "key", "lang"))
      .join(baseShingles, Seq("base_id"))
      .withColumn("inter", expr("size(array_intersect(sh, sh_b))"))
      .filter(col("inter").cast("double") /
        (expr("size(sh)") + expr("size(sh_b)") - col("inter")) >= threshold)
      .select(col("doc_id").as("delta_id"), col("base_id"))
  }

  /** Static sides for [[ccDeltaBaseEdges]]: the standing fuzzy index's
    * base band and shingle tables (the SAME tables the batch incremental
    * probes — one band family, so streamed candidates match the batch
    * edges bit-for-bit).
    */
  def ccBaseSides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    graft.queries.Text.ensureFuzzyIndex(spark, dir)
    (spark.table("graft_fuzzy_bands_bq")
      .select(col("band"), col("key"), col("lang"),
        col("doc_id").as("base_id")),
      spark.table("graft_fuzzy_sh_bq")
        .select(col("doc_id").as("base_id"), col("sh").as("sh_b")))
  }

  /** Static sides for [[fuzzyContaminatedDocs]]: the benchmark source's
    * minhash band table (band, key, lang, bench_id) and shingle sets
    * (bench_id, sh_b), both computed in batch — the same band family the
    * whole near-dup suite shares, so the stream twin's candidates match
    * `txFuzzyDecontaminate`'s bit-for-bit.
    */
  def fuzzyBenchmarkSides(spark: SparkSession, dir: String,
      benchmarkSource: String = "src0", numSlots: Int = 16,
      bandSize: Int = 4): (DataFrame, DataFrame) = {
    graft.functions.TextFunctions.ensureRegistered(spark)
    val b = graft.Tables(spark, dir, "documents")
      .filter(col("source") === benchmarkSource)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
    val bands = b
      .withColumn("bands", expr(s"minhash_bands(toks, 3, $numSlots, $bandSize)"))
      .select(col("doc_id").as("bench_id"), col("lang"), posexplode(col("bands")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    val shingles = b
      .withColumn("sh_b", expr(graft.queries.Text.shingleExpr(3)))
      .select(col("doc_id").as("bench_id"), col("sh_b"))
    (bands, shingles)
  }

  /** The static base digest set for [[admittedDeltaDocs]] — the distinct
    * 60-bit md5-derived content digests of the already-deduped corpus,
    * computed in batch (`graft.queries.Text.ddIncremental`'s base side).
    * In production this is the persisted digest index the batch operator's
    * scaladoc describes, refreshed by compaction between stream restarts.
    */
  def baseDigestKeys(spark: SparkSession, dir: String,
      deltaMod: Long = graft.queries.Text.incrementalDeltaMod): DataFrame =
    graft.Tables(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(deltaMod)) =!= 0)
      .select(expr(graft.queries.Text.textDigestExpr).as("hk"))
      .distinct()

  /** Streaming incremental dedup (the stream twin of
    * `graft.queries.Text.ddIncremental`, as [[contaminatedDocsHashed]]
    * twins the batch decontamination): newly-landing documents are
    * admitted iff their content digest is absent from the STATIC base
    * digest set (a stateless stream-static LEFT ANTI join shipping 8-byte
    * longs) and no earlier micro-batch admitted the same digest
    * (streaming `dropDuplicates` on the digest — keyed state, one 8-byte
    * key per distinct NEW digest). Emits one admitted row per new digest.
    *
    * The admitted digest SET and per-language counts are deterministic
    * and equal the batch operator's (StreamingSpec asserts both on the
    * planted corpus); WHICH document represents a within-stream duplicate
    * cluster follows arrival order, not the batch keep-first-by-doc_id —
    * the same arrival-order caveat as every streaming twin here. Content
    * digests carry no event time, so the dedup state has no watermark to
    * evict by; production bounds it by periodically compacting admitted
    * digests into the base set and restarting the stream on the enlarged
    * static side — state then spans one compaction interval, not the
    * stream's lifetime.
    */
  def admittedDeltaDocs(deltaStream: DataFrame, baseKeys: DataFrame): DataFrame =
    deltaStream
      .select(col("doc_id"), col("lang"),
        expr(graft.queries.Text.textDigestExpr).as("hk"))
      .join(baseKeys, Seq("hk"), "left_anti")
      .dropDuplicates("hk")

  /** Streaming twin of `graft.queries.Text.pipelineMergeSnapshot`'s
    * classify stage: updates ARRIVE as a stream (the production merge
    * shape — a CDC/ingest feed against a static snapshot) and each row is
    * classified update / insert / delete by a STATELESS stream-static
    * left join against the base key set (8-byte keys; the marker column
    * beats a null-probe on payloads). `unchanged` is inherently a batch
    * notion — it needs the full base sweep, which the batch operator's
    * full-outer join provides — so the stream emits one classified row
    * per UPDATE-SIDE row and nothing for untouched base rows;
    * StreamingSpec asserts the emitted classes equal the batch audit's
    * update/insert/delete partitions exactly.
    */
  def classifiedUpdates(updateStream: DataFrame, baseKeys: DataFrame): DataFrame =
    updateStream
      .join(baseKeys.withColumn("in_base", lit(1)), Seq("k"), "left")
      .withColumn("action",
        when(col("op") === "delete", lit("delete"))
          .when(col("in_base") === 1, lit("update"))
          .otherwise(lit("insert")))
      .select("k", "action", "new_text")

  /** The standing fuzzy-dedup index tables for [[fuzzyAdmittedDocs]] —
    * ensures `graft.queries.Text.fuzzyBuildIndex`'s bucketed band and
    * shingle tables exist and returns them. The static side of the
    * stream, refreshed by compaction between stream restarts (the
    * [[baseDigestKeys]] production note applied to the fuzzy index).
    */
  def fuzzyIndexTables(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    graft.queries.Text.ensureFuzzyIndex(spark, dir)
    (spark.table("graft_fuzzy_bands_bq"), spark.table("graft_fuzzy_sh_bq"))
  }

  /** Streaming fuzzy dedup at ingest — the stream twin of
    * `graft.queries.Text.ddIncrementalFuzzyIndexed`'s vs-base leg:
    * newly-landing documents band and shingle themselves, probe the
    * STANDING band table (stream-static left-outer join — stateless),
    * confirm candidates by exact shingle Jaccard against the standing
    * shingle table, and aggregate to one (doc_id, lang,
    * near_dup_vs_base) decision per document. Within-stream (delta-delta)
    * duplicates are the exact-digest stage's job upstream
    * ([[admittedDeltaDocs]]) — the production layering: cheap exact dedup
    * in-stream, fuzzy only against the compacted standing index.
    *
    * Docs with fewer than 3 tokens can't band (and can't near-dup); they
    * are dropped before the probe, as in the batch twin's band path.
    * The per-doc aggregation state is one boolean per streamed doc_id —
    * bounded by the same compaction-interval restart discipline as the
    * digest-dedup state ([[admittedDeltaDocs]]'s scaladoc).
    */
  def fuzzyAdmittedDocs(deltaStream: DataFrame, baseBands: DataFrame,
      baseShingles: DataFrame, numSlots: Int = 16, bandSize: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    graft.functions.TextFunctions.ensureRegistered(deltaStream.sparkSession)
    val banded = deltaStream
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh_a", expr(graft.queries.Text.shingleExpr(3)))
      .withColumn("bands",
        expr(s"minhash_bands(toks, 3, $numSlots, $bandSize)"))
      .select(col("doc_id"), col("lang"), col("sh_a"),
        posexplode(col("bands")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    banded
      .join(baseBands
          .select(col("band"), col("key"), col("lang"),
            col("doc_id").as("base_id")),
        Seq("band", "key", "lang"), "left_outer")
      .join(baseShingles
          .select(col("doc_id").as("base_id"), col("sh").as("sh_b")),
        Seq("base_id"), "left_outer")
      .withColumn("inter", expr("size(array_intersect(sh_a, sh_b))"))
      .withColumn("hit", coalesce(
        col("inter").cast("double") /
          (expr("size(sh_a)") + expr("size(sh_b)") - col("inter")) >=
          threshold,
        lit(false)))
      .groupBy("doc_id", "lang")
      .agg(max("hit").as("near_dup_vs_base"))
  }

  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class SeqEvent(user_id: Long, event_id: Long, ts_us: Long,
      event_type: String, value: Double)
  case class SeqCarry(t1: String, ts1: Long, t2: String, ts2: Long)
  case class SeqMatch(user_id: Long, start_ts_us: Long, purchase_cents: Long)
  case class UserRunning(user_id: Long, n_events: Long, total_cents: Long)
  // ts kept alongside its micros: the watermark tag must survive into
  // the flatMapGroupsWithState child or EventTimeTimeout is rejected
  case class SessEvent(user_id: Long, event_id: Long, ts_us: Long,
    ts: java.sql.Timestamp)
  case class SessState(start_us: Long, last_us: Long, n: Long)
  case class SessionOut(user_id: Long, session_start_us: Long,
    session_end_us: Long, n_events: Long)
  case class TouchEv(event_id: Long, ts_us: Long, event_type: String)
  case class TouchCarry(touches: Seq[TouchEv])
  case class AttrCredit(user_id: Long, conv_id: Long, channel: String,
    idx: Int, n: Int, linear_ppm: Long, ushape_ppm: Long,
    first: Boolean, last: Boolean)

  /** Custom stateful accumulation via flatMapGroupsWithState: per-user
    * running totals that survive across micro-batches — the
    * `KeyValueGroupedDataset` escape hatch for semantics windows can't
    * express (SURVEY.md build brief). Value math is integer cents so the
    * running state is exact.
    */
  /** Score a DOCUMENT STREAM with the standing quality model
    * (`graft.queries.Text.ensureMqIndex`) — the streaming serve of the
    * model-based filter: the feature projection is the shared
    * `mqFeaturize` text (pure stateless projection — codegen'd
    * histogram, no shuffle, so it runs unchanged under the streaming
    * planner), and the D persisted weights are index METADATA embedded
    * as a literal array (the bounded-collect rule: D doubles, the
    * probe-list treatment — a stream-static join for one constant row
    * would be pure overhead). Emits per-doc (doc_id, lang, source,
    * score, pass); batch/stream equality is StreamingSpec-pinned.
    */
  def qualityScoredDocs(docsStream: DataFrame, weights: Seq[Double]): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(docsStream.sparkSession)
    val scored = graft.queries.Text.mqFeaturize(docsStream)
      .withColumn("wv", array(weights.map(lit(_)): _*))
      .withColumn("score", expr(
        "double_dot(wv, x)")) // codegen'd, bit-identical to the fold (r16-opt)
    scored.select(col("doc_id"), col("lang"), col("source"), col("score"),
      (col("score") > 0.5d).as("pass"))
  }

  /** Streaming half of [[graft.queries.Text.pipelineAggRefresh]]: the
    * delta partials as a STREAMING AGGREGATION over the landing
    * documents — the same [[graft.queries.Text.aggMvPartials]]
    * projection+groupBy text (counts, token sums, the 64-bit md5 XOR
    * fold; every aggregate is associative/commutative, which is what
    * makes it both shuffle-mergeable AND streaming-state-mergeable).
    * Run with `outputMode("complete")`, the sink holds exactly the
    * delta partial table; [[graft.queries.Text.aggMvMerge]] then folds
    * it into the standing aggregates — the spec pins streamed-partials
    * + merge ≡ the batch refresh row for row.
    */
  def aggDeltaPartials(docsStream: DataFrame): DataFrame =
    graft.queries.Text.aggMvPartials(docsStream)

  /** Streaming half of [[graft.queries.Text.pipelineAggRetract]] — the
    * CDC DELETE twin: tombstoned documents land as a stream (the shape a
    * change feed delivers), the same [[aggDeltaPartials]] streaming
    * aggregation folds their payloads, and
    * [[graft.queries.Text.aggMvRetract]] XORs them back OUT of the
    * standing view (self-inverse — the one fold text serves insert and
    * delete). AggRefreshSpec pins streamed-retract ≡ the batch retract ≡
    * the one-pass recompute of the surviving corpus, row for row.
    */
  def aggRetractPartials(deletedDocsStream: DataFrame): DataFrame =
    graft.queries.Text.aggMvPartials(deletedDocsStream)

  /** Streaming half of [[graft.queries.Text.txKmvRefresh]]: landing
    * delta documents run the SAME 60-bit shingle-key projection
    * ([[graft.queries.Text.kmvKeyProjection]] — one definition), deduped
    * as a streaming aggregation; run with `outputMode("complete")`, the
    * sink holds the distinct delta (source, gk) keys, and bottom-k-ing
    * them into the standing sketches is the lossless KMV union — the
    * spec pins streamed-refresh ≡ batch refresh ≡ full rebuild.
    */
  def kmvDeltaKeys(docsStream: DataFrame): DataFrame =
    graft.queries.Text.kmvKeyProjection(docsStream)
      .groupBy("source", "gk")
      .agg(count(lit(1)).as("n"))

  /** Streaming half of [[graft.queries.Text.txCmsRefresh]]: landing
    * delta documents fan out to the SAME (source, row, cell) counter
    * increments ([[graft.queries.Text.cmsCellsBySource]] — one
    * definition); run with `outputMode("complete")`, the sink holds the
    * delta cell table, and ADDING it to the standing cells IS the
    * lossless CMS merge (count-min is linear) — the spec pins
    * streamed-refresh ≡ batch refresh ≡ full recompute.
    */
  def cmsDeltaCells(docsStream: DataFrame): DataFrame =
    graft.queries.Text.cmsCellsBySource(
      graft.queries.Text.cmsGrams(docsStream))

  /** Streaming twin of [[graft.queries.Text.txHistRefresh]]'s delta
    * side — landing documents bucket into the SAME per-source
    * fixed-width counters ([[graft.queries.Text.histCells]], one
    * definition), merged into the standing cells by addition at
    * compaction (counters are linear — the cmsDeltaCells argument for
    * the quantile sketch). NoveltyHistSpec pins streamed + standing ≡
    * the one-pass full-corpus histogram.
    */
  def histDeltaCells(docsStream: DataFrame): DataFrame =
    graft.queries.Text.histCells(docsStream)

  /** Streaming twin of the GDPR forget's DISCOVERY side — erasure
    * requests screened AT INGEST: each landing requested doc_id
    * stream-static joins every standing text surface, and the running
    * per-surface rollup counts the REFERENCES the forget rewrite will
    * have to erase (a labels row whose member AND component both match
    * counts once per column — reference semantics, documented; the
    * batch audit's `n_refs` counts ROWS with any match, so the spec
    * compares this twin against a same-semantics batch recount, not
    * against n_refs). This is the triage a privacy queue runs the
    * moment a request lands — scoping the blast radius before the
    * rewrite job is scheduled; the physical erasure stays batch
    * ([[graft.queries.Text.ensureGdprForget]]).
    */
  def erasureRefCounts(idsStream: DataFrame, spark: SparkSession,
      dir: String): DataFrame = {
    import graft.queries.Text
    Text.ensureFuzzyIndex(spark, dir)
    val bm = Text.ensureBm25Index(spark, dir)
    val cc = Text.ensureCcBase(spark, dir)
    def leg(surface: String, static: DataFrame,
        idCol: String): DataFrame =
      idsStream.select(col("doc_id"))
        .join(static.select(col(idCol).as("doc_id")), Seq("doc_id"))
        .select(lit(surface).as("surface"))
    Seq(
      leg("corpus", graft.Tables(spark, dir, "documents"), "doc_id"),
      leg("fuzzy_bands", spark.table("graft_fuzzy_bands_bq"), "doc_id"),
      leg("fuzzy_sh", spark.table("graft_fuzzy_sh_bq"), "doc_id"),
      leg("bm25_postings", spark.read.parquet(s"$bm/postings"), "doc_id"),
      leg("bm25_doclens", spark.read.parquet(s"$bm/doclens"), "doc_id"),
      leg("cc_edges_a", spark.read.parquet(s"$cc/edges"), "id_a"),
      leg("cc_edges_b", spark.read.parquet(s"$cc/edges"), "id_b"),
      leg("cc_labels_member", spark.read.parquet(s"$cc/labels"), "id"),
      leg("cc_labels_component", spark.read.parquet(s"$cc/labels"),
        "component"))
      .reduce(_ unionByName _)
      .groupBy("surface")
      .agg(count(lit(1)).as("n_refs"))
  }

  /** Streaming twin of [[graft.queries.Text.txBoilerplate]]: landing
    * documents carve into the SAME 20-token block keys
    * ([[graft.queries.Text.boilerBlocksOver]] — one definition) and
    * stream-static left-join the standing per-source boilerplate table
    * ([[graft.queries.Text.boilerplateBlocks]]); each doc emits its
    * strip accounting at ingest — the filter-at-landing shape of the C4
    * rule. Spec pins per-doc batch/stream equality on a planted delta.
    */
  def boilerplateFlaggedDocs(docsStream: DataFrame,
      boilerBlocks: DataFrame): DataFrame =
    graft.queries.Text.boilerBlocksOver(docsStream)
      .join(boilerBlocks.withColumn("boiler", lit(true)),
        Seq("source", "bh"), "left")
      .groupBy("doc_id", "lang", "source")
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("n_boiler_paras"),
        sum(when(col("boiler"), 0L).otherwise(col("n_toks"))).as("n_tokens_kept"),
        sum(when(col("boiler"), col("n_toks")).otherwise(0L)).as("n_tokens_stripped"))

  /** Streaming twin of the expectations gate
    * ([[graft.queries.Text.pipelineExpectations]] /
    * [[graft.queries.Text.pipelineQuarantine]]): validate landing
    * documents AT INGEST against the SAME rule suite
    * ([[graft.queries.Text.expectationFails]] — one definition, so the
    * stream can never admit a row the batch gate would quarantine) and
    * tag each with its rule-ordered violation list plus the routing
    * verdict. Pure stateless narrow stage — the Delta Live Tables
    * `EXPECT ... ON VIOLATION` shape, where clean rows flow to the
    * corpus sink and `quarantined` rows to the dead-letter sink of the
    * same foreachBatch. Per-doc batch/stream equality is spec-pinned on
    * a planted dirty landing.
    */
  def validatedDocs(docsStream: DataFrame): DataFrame = {
    val fails = graft.queries.Text.expectationFails
    docsStream.select(col("doc_id"), col("lang"), col("n_chars"),
      concat_ws(",",
        fails.map { case (n, f) => when(f, lit(n)) }: _*).as("violations"),
      fails.map(_._2).reduce(_ || _).as("quarantined"))
  }

  /** Streaming twin of [[graft.queries.Text.txDsirSelect]]: score
    * landing documents against the STANDING target/raw n-gram
    * distributions — filter-at-ingest, the deployment shape DSIR's
    * paper targets (score the crawl as it lands, admit the target-like
    * part). The distributions ride along as literal arrays
    * (2·dsirBuckets longs + two totals — bounded index metadata, the
    * [[qualityScoredDocs]] weights treatment; scalar subqueries don't
    * exist under the streaming planner), and the score is the SAME
    * exact-integer fold text the batch side runs
    * ([[graft.queries.Text.dsirScoreExpr]] — one definition, two
    * bindings), over the SAME feature projection
    * ([[graft.queries.Text.dsirFeaturize]]). Pure stateless narrow
    * stage: no watermark, no state. Per-doc batch/stream equality is
    * spec-pinned.
    */
  def dsirSelectedDocs(docsStream: DataFrame, nt: Seq[Long], nr: Seq[Long],
      tN: Long, rN: Long): DataFrame = {
    graft.functions.TextFunctions.ensureRegistered(docsStream.sparkSession)
    graft.queries.Text.dsirFeaturize(docsStream)
      .withColumn("ntv", array(nt.map(lit(_)): _*))
      .withColumn("nrv", array(nr.map(lit(_)): _*))
      .withColumn("tnv", lit(tN))
      .withColumn("rnv", lit(rN))
      .withColumn("score",
        expr(graft.queries.Text.dsirScoreExpr("ntv", "nrv", "tnv", "rnv")))
      .select(col("doc_id"), col("lang"), col("source"), col("score"),
        (col("score") > 0L).as("selected"))
  }

  /** Streaming twin of [[graft.queries.Text.txLmPerplexity]]'s scorer:
    * landing documents score against the STANDING reference-LM
    * histograms — perplexity-filter-at-ingest, CCNet's deployment shape
    * (the KenLM scores the crawl as it lands; bucket thresholds come
    * from the standing corpus). The histograms ride along as literal
    * arrays (2·lmBuckets longs — the [[dsirSelectedDocs]] rule), the
    * cost is the SAME whole-bit fold text
    * ([[graft.queries.Text.lmBitsExpr]]) over the SAME feature
    * projection ([[graft.queries.Text.lmFeaturize]]). Pure stateless
    * narrow stage; per-doc batch/stream equality is spec-pinned, and
    * re-bucketing the streamed scores reproduces the batch tercile
    * report.
    */
  def lmScoredDocs(docsStream: DataFrame, nb: Seq[Long],
      nc: Seq[Long]): DataFrame = {
    graft.functions.TextFunctions.ensureRegistered(docsStream.sparkSession)
    graft.queries.Text.lmFeaturize(docsStream)
      .filter(!col("is_ref"))
      .withColumn("nbv", array(nb.map(lit(_)): _*))
      .withColumn("ncv", array(nc.map(lit(_)): _*))
      .withColumn("bits", expr(graft.queries.Text.lmBitsExpr("nbv", "ncv")))
      .withColumn("ppm", expr(graft.queries.Text.lmPpmSparkExpr))
      .select("doc_id", "lang", "source", "n_bi", "bits", "ppm")
  }

  /** Streaming twin of [[graft.queries.Text.txPiiRedact]]'s scrub: the
    * SAME shared per-document projection (`Text.piiScrub` — plant →
    * regex count → replace → digest, a pure stateless narrow stage, so
    * the streaming planner runs it unchanged and no watermark or state
    * is needed) applied to a landing document stream — scrub-at-ingest,
    * the shape every PII pipeline wants so raw text never reaches the
    * lake. Emits per-doc (doc_id, lang, counts, redacted digest);
    * batch/stream equality is StreamingSpec-pinned.
    */
  def piiScrubbedDocs(docsStream: DataFrame): DataFrame =
    graft.queries.Text.piiScrub(docsStream)
      .select(col("doc_id"), col("lang"), col("n_emails"), col("n_phones"),
        col("n_ips"), col("hd"))

  /** Streaming twin of [[graft.queries.Text.txCleanNormalize]]:
    * normalize-at-ingest via the SAME shared projection
    * (`Text.cleanNormalize` — plant → count → strip/collapse/trim →
    * digest, pure stateless narrow stage), so crawl text lands already
    * cleaned — the stage order every C4-shape pipeline wants (normalize
    * before any digesting consumer). Emits per-doc (doc_id, lang,
    * counts, cleaned digest); batch/stream equality is
    * StreamingSpec-pinned.
    */
  def cleanedDocs(docsStream: DataFrame): DataFrame =
    graft.queries.Text.cleanNormalize(docsStream)
      .select(col("doc_id"), col("lang"), col("n_ctrl"),
        col("n_space_runs"), col("n_nl_runs"), col("hd"))

  /** Streaming twin of [[graft.queries.Text.gopherFlags]]: the Gopher
    * word-level quality gate at ingest — crawl documents carry their
    * five rule flags (word-count band, mean-length band, symbol ratio,
    * alpha-word ratio, stopword presence) the moment they land, so a
    * downstream writer can route pass/fail without a second corpus
    * pass. Pure stateless narrow stage over exact integers;
    * batch/stream equality is StreamingSpec-pinned.
    */
  def gopherFlaggedDocs(docsStream: DataFrame): DataFrame =
    graft.queries.Text.gopherFlags(docsStream)
      .select(col("doc_id"), col("lang"), col("n_words"),
        col("fail_word_count"), col("fail_mean_len"), col("fail_symbol"),
        col("fail_alpha"), col("fail_stop"))

  /** Streaming twin of the BPE encode — tokenize-at-ingest with the
    * STANDING tokenizer: the persisted vocabulary's (token → encoded
    * length) table rides along as a literal map (bounded index
    * metadata, the qualityScoredDocs weights treatment), and each
    * landing document reports its exact char/symbol accounting in one
    * stateless projection. Unseen tokens fall back to character length
    * (an untrained token encodes symbol-per-character — BPE's own
    * base-case). `try_element_at`: ANSI `element_at` throws on missing
    * keys (the sparse-vector rule).
    */
  def bpeEncodedDocs(docsStream: DataFrame,
      vocab: Seq[(String, Int)]): DataFrame = {
    val entries = vocab.flatMap { case (t, n) => Seq(lit(t), lit(n)) }
    docsStream
      .withColumn("vm", map(entries: _*))
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_chars_toks", expr(
        "aggregate(toks, 0L, (acc, t) -> acc + length(t))"))
      .withColumn("n_symbols", expr(
        "aggregate(toks, 0L, (acc, t) -> acc + coalesce(try_element_at(vm, t), length(t)))"))
      .select(col("doc_id"), col("lang"), size(col("toks")).as("n_tokens"),
        col("n_chars_toks").as("n_chars"), col("n_symbols"))
  }

  /** Static side of the streaming media-frame dedup: the standing
    * corpus's distinct frame digests (the base partition of the
    * [[graft.multimodal.Multimodal.frameDedup]] rule — media landing
    * later dedup against what the lake already holds).
    */
  def baseFrameKeys(spark: SparkSession, dir: String,
      deltaMod: Long = 5L): DataFrame =
    graft.multimodal.Multimodal.frameSample(
      graft.multimodal.Multimodal.fromDocuments(
        graft.Tables(spark, dir, "documents")
          .filter(col("doc_id") % deltaMod =!= 0)))
      .select("frame_md5").distinct()

  /** Streaming twin of the frame dedup's admission half — dedup media at
    * INGEST: each landing media's frames ([[graft.multimodal.Multimodal
    * .frameSample]] runs unchanged under the streaming planner — pure
    * stateless slicing) semi-join the standing frame-digest set, so a
    * frame already in the lake is flagged before the payload lands. The
    * same stream-static semi-join shape as [[contaminatedDocs]]; emits
    * (media_id, frame_idx, frame_md5) per duplicate frame.
    */
  def dupMediaFrames(docsStream: DataFrame,
      baseKeys: DataFrame): DataFrame =
    graft.multimodal.Multimodal.frameSample(
      graft.multimodal.Multimodal.fromDocuments(docsStream))
      .join(baseKeys, Seq("frame_md5"), "left_semi")
      .select(col("media_id"), col("frame_idx"), col("frame_md5"))

  /** Static sides of the streaming temporal-align twin: the STANDING
    * shingle and frame tables ([[graft.multimodal.Multimodal
    * .ensureAlignIndex]] — persisted, not recomputed per batch).
    */
  def alignBaseSides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = graft.multimodal.Multimodal.ensureAlignIndex(spark, dir)
    (spark.read.parquet(s"$base/shingles"),
      spark.read.parquet(s"$base/frames"))
  }

  /** Streaming twin of [[graft.multimodal.Multimodal.temporalAlign]]'s
    * candidate discovery — re-cut detection at INGEST: each landing
    * media's order-sensitive 3-frame shingles ([[graft.multimodal
    * .Multimodal.alignShingles]] — array-native, stateless under the
    * streaming planner) probe the standing shingle table, emitting one
    * (landing, base) candidate row per shared shingle. Dedup and the
    * offset/run rollup are deliberately NOT here: both are stateful
    * aggregations, and deployment runs them at compaction
    * ([[alignCompaction]]) over the drained candidate log — the
    * [[ccDeltaBaseEdges]] treatment for ordered frame evidence.
    */
  def alignCandidates(docsStream: DataFrame,
      baseShingles: DataFrame): DataFrame =
    graft.multimodal.Multimodal.alignShingles(
      graft.multimodal.Multimodal.fromDocuments(docsStream,
        graft.multimodal.Multimodal.alignFrames))
      .join(baseShingles.select(col("g"),
        col("media_id").as("base_media_id")), "g")
      .select(col("media_id").as("landing_media_id"), col("base_media_id"))

  /** Compaction half of the streaming temporal-align: canonicalize the
    * drained candidate log (orientation + dedup) and feed it through
    * the IDENTICAL per-pair offset/run fold the batch operator uses
    * ([[graft.multimodal.Multimodal.alignRollup]]), aligning landing
    * frames against the standing frame table — so streamed ≡ batch
    * holds by construction past candidate discovery (StreamingSpec pins
    * it end-to-end on a planted trimmed re-cut).
    */
  def alignCompaction(candidates: DataFrame, landingDocs: DataFrame,
      baseFrames: DataFrame,
      minRun: Long = graft.multimodal.Multimodal.alignMinRun): DataFrame = {
    val cands = candidates
      .select(least(col("landing_media_id"), col("base_media_id")).as("media_a"),
        greatest(col("landing_media_id"), col("base_media_id")).as("media_b"))
      .distinct()
    val landingFrames = graft.multimodal.Multimodal.frameSample(
        graft.multimodal.Multimodal.fromDocuments(landingDocs,
          graft.multimodal.Multimodal.alignFrames))
      .filter(col("frame_bytes") > 0)
      .select(col("media_id"), col("frame_idx"), col("frame_md5"))
    graft.multimodal.Multimodal.alignRollup(cands,
      baseFrames.unionByName(landingFrames), minRun)
  }

  /** Streaming twin of the version-log APPEND
    * ([[graft.queries.Text.ensureVersionLog]]): a landing corpus batch
    * carves its MERGE events with the IDENTICAL [[graft.queries.Text
    * .ttBatch]] projection — three narrow filters under a union,
    * stateless, so it runs unchanged under the streaming planner and
    * the event batch that lands as log partition `ver=v` is
    * bit-identical whether the corpus arrived at rest or as a stream
    * (StreamingSpec pins carve equality AND that the landed log serves
    * the same last-writer-wins state through
    * [[graft.queries.Text.stateAt]]).
    */
  def ttDeltaEvents(docsStream: DataFrame, v: Int): DataFrame =
    graft.queries.Text.ttBatch(
      docsStream.select(col("doc_id"), col("text")), v)

  /** EXACTLY-ONCE version-log append — the `foreachBatch` idempotence
    * pattern every production streaming MERGE relies on: a batch
    * (keyed by its version = the streaming epoch id) lands via DYNAMIC
    * partition overwrite, so a re-delivery after a sink failure
    * REPLACES its own partition instead of duplicating it — replaying
    * the same deterministic batch is a no-op byte-for-byte
    * (StreamingSpec appends twice and pins both the event count and
    * the served state). Other partitions are untouched (dynamic mode
    * overwrites only partitions present in the write), so concurrent
    * epochs stay isolated the way the append-only log requires.
    */
  def ttIdempotentAppend(events: DataFrame, logEvents: String,
      v: Int): Unit =
    events.withColumn("ver", lit(v))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ver").parquet(logEvents)

  /** Streaming CDC twin of [[graft.queries.Text.pipelineVersionDiff]]
    * for the single-batch tail window (checkpoint → next version — the
    * natural per-commit CDC feed): each landing MERGE event classifies
    * against the STATIC checkpointed state
    * ([[graft.queries.Text.ensureTtCheckpoint]]) by one stateless
    * stream-static left join on the key — insert (key absent), delete
    * (tombstone of a present key; a tombstone of an absent key is a
    * no-op and emits nothing), update (payload digest changed). The
    * XOR-able digests ride along so compaction's rollup over the
    * drained change log equals the batch diff's audit bit-for-bit
    * (StreamingSpec pins it against `pipelineVersionDiff(from =
    * ttCheckpointVer, to = ttCheckpointVer + 1)`). Multi-batch windows
    * need a last-writer-wins fold first — that is the batch operator's
    * job; the stream twin is the per-commit feed.
    */
  def cdcDeltaChanges(eventsStream: DataFrame, ckState: DataFrame): DataFrame =
    eventsStream
      .join(ckState.select(col("k"),
        md5(col("text").cast("binary")).as("old_hd")), Seq("k"), "left")
      .withColumn("new_hd",
        when(col("op") === "upsert", md5(col("new_text").cast("binary"))))
      .withColumn("change_type",
        when(col("op") === "delete" && col("old_hd").isNotNull, "delete")
          .when(col("op") === "upsert" && col("old_hd").isNull, "insert")
          .when(col("op") === "upsert" && col("new_hd") =!= col("old_hd"),
            "update"))
      .filter(col("change_type").isNotNull)
      .select(col("k"), col("change_type"), col("old_hd"), col("new_hd"))

  /** The standing model's weight vector for [[qualityScoredDocs]] —
    * ensures the index, then collects the 1-row weights table (D
    * doubles of index metadata).
    */
  def qualityModelWeights(spark: SparkSession, dir: String): Seq[Double] = {
    val base = graft.queries.Text.ensureMqIndex(spark, dir)
    spark.read.parquet(s"$base/weights")
      .collect().head.getSeq[Double](0)
  }

  def runningUserTotals(events: DataFrame): Dataset[UserRunning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_type"),
        col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserRunning]) => {
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0L))
          val next = rows.foldLeft(prev)((acc, e) =>
            UserRunning(userId, acc.n_events + 1,
              acc.total_cents + math.round(e.value * 100)))
          state.update(next)
          Iterator.single(next)
        })
  }

  /** Streaming twin of [[graft.queries.Text.txChunkOverlap]]'s chunk
    * projection — strided chunk-with-overlap AT INGEST (the shape a
    * RAG indexing pipeline consumes: each landing document splits into
    * its overlapping windows before embedding/indexing): the identical
    * [[graft.queries.Text.chunkRows]] text, a pure stateless
    * explode+slice, so it runs unchanged under the streaming planner —
    * no state, no watermark, no shuffle. Emits (doc_id, lang, chunk
    * start, length, md5); StreamingSpec pins row-for-row equality with
    * the batch projection on the natural corpus.
    */
  def chunkedDocs(docsStream: DataFrame): DataFrame =
    graft.queries.Text.chunkRows(docsStream)
      .select(col("doc_id"), col("lang"), col("start"), col("clen"),
        col("hd").as("chunk_md5"))

  /** Streaming twin of [[graft.queries.Events.evSequenceDetect]] — the
    * MATCH_RECOGNIZE-lite contiguous `view → click → purchase` trigram
    * detector as a `flatMapGroupsWithState` over the live event stream,
    * substantiating the batch scaladoc's claim that the same semantics
    * run stateful-streaming: per-user state is exactly the LAST TWO
    * event (type, ts) pairs — O(1), never the history — carried across
    * micro-batches, so a trigram that STRADDLES a batch boundary still
    * fires (StreamingSpec plants one). Within a batch the group's rows
    * sort by (ts, event_id) — the batch operator's stream order; across
    * batches the file source's in-order delivery is the documented
    * assumption (same contract as every watermarkless twin here).
    * Emits one row per match (user, trigram-start micros, purchase
    * cents — exact integers); the spec folds emissions to the batch
    * operator's per-user aggregate and pins equality on sf0.001.
    */
  /** Streaming twin of [[graft.queries.Events.evAttribution]] — credit
    * assignment AT CONVERSION TIME as `flatMapGroupsWithState`: per-user
    * state is exactly the touch list since the last purchase (the
    * natural attribution state — a real-time marketing stack holds the
    * same open journey), a landing purchase emits one credit row per
    * touch with the SAME exact-ppm integer arithmetic as the batch
    * operator (linear remainder-to-last, 40/20/40 U-shape with the
    * remainder to the last middle) and clears the journey; `error`
    * events and trailing touches never emit — identical drop semantics.
    * Within a batch the group's rows sort by (ts, event_id); across
    * batches the file source's in-order delivery is the documented
    * assumption (the sequenceMatches contract). A journey that STRADDLES
    * a micro-batch boundary still credits — StreamingSpec plants one and
    * folds all emissions to the batch rollup, pinning every column.
    *
    * Bounded state (r13 ADVICE): a user who never purchases would
    * otherwise grow the open journey without bound across the stream's
    * lifetime. The journey caps at `maxTouches`; past it the SECOND
    * touch drops (oldest middle) so both U-shape anchors — the first
    * touch (40%) and the most recent tail — survive and the linear
    * split degrades gracefully to the retained touches. Under the cap
    * (every realistic journey; the spec corpus never reaches it) the
    * batch twin matches exactly; a capped journey credits the retained
    * touches only — the documented divergence contract.
    */
  def attributedCredits(events: DataFrame,
      maxTouches: Int = 1024): Dataset[AttrCredit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val touchTypes = Set("view", "click", "signup")
    events.select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("ts_us"), col("event_type"),
        col("value"))
      .as[SeqEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[SeqEvent], state: GroupState[TouchCarry]) => {
          var touches = state.getOption.map(_.touches).getOrElse(Seq.empty)
          val out = scala.collection.mutable.ArrayBuffer.empty[AttrCredit]
          rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (touchTypes(e.event_type)) {
              // Enforce the cap for ANY maxTouches >= 1 and for restored
              // state already above it (r14 ADVICE: the old one-middle
              // drop assumed maxTouches >= 2 and shrank an over-cap
              // buffer by only one per arrival): shrink to maxTouches-1
              // BEFORE appending by keeping the first-touch anchor and
              // the newest middles — the same oldest-middle-drop
              // semantics, generalized.
              if (touches.size >= maxTouches) {
                touches =
                  if (maxTouches <= 1) Seq.empty
                  else touches.head +: touches.takeRight(maxTouches - 2)
              }
              touches = touches :+ TouchEv(e.event_id, e.ts_us, e.event_type)
            }
            else if (e.event_type == "purchase") {
              val n = touches.size
              touches.zipWithIndex.foreach { case (t, i0) =>
                val idx = i0 + 1
                val linear = 1000000L / n +
                  (if (idx == n) 1000000L % n else 0L)
                val ushape =
                  if (n == 1) 1000000L
                  else if (n == 2) 500000L
                  else if (idx == 1 || idx == n) 400000L
                  else 200000L / (n - 2) +
                    (if (idx == n - 1) 200000L % (n - 2) else 0L)
                out += AttrCredit(uid, e.event_id, t.event_type, idx, n,
                  linear, ushape, idx == 1, idx == n)
              }
              touches = Seq.empty
            }
          }
          state.update(TouchCarry(touches))
          out.iterator
        })
  }

  /** Custom sessionization with EVENT-TIME TIMEOUT — the GroupState API
    * surface the other stateful twins don't exercise
    * (GroupStateTimeout.EventTimeTimeout): per-user state is the OPEN
    * session (start, last-seen, count); a landing event either extends
    * it (gap < 10 min — the strict-inequality `session_window`
    * convention, so the two agree session for session) or closes it and
    * opens the next; and a session with no successor closes when the
    * WATERMARK passes its end — `state.hasTimedOut` fires with no input
    * rows, which is exactly what the built-in session_window does
    * internally and what a hand-rolled sessionizer must reproduce to
    * avoid leaking open-session state forever. Emits one row per closed
    * session (end = last + gap, the session_window end convention);
    * StreamingSpec drains the corpus, pushes the watermark with a
    * sentinel user, and pins the emitted set against a hand split AND
    * the batch ev_session_window rollup.
    */
  def timedOutSessions(events: DataFrame, gapMinutes: Int = 10,
      lateness: String = "0 seconds"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("ts_us"), col("ts"))
      .withWatermark("ts", lateness)
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, rows: Iterator[SessEvent], state: GroupState[SessState]) => {
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          def close(s: SessState): Unit =
            out += SessionOut(uid, s.start_us, s.last_us + gapUs, s.n)
          if (state.hasTimedOut) {
            state.getOption.foreach(close)
            state.remove()
            out.iterator
          } else {
            var st = state.getOption
            rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
              st match {
                case Some(s) if e.ts_us - s.last_us < gapUs =>
                  st = Some(SessState(s.start_us, e.ts_us, s.n + 1))
                case Some(s) =>
                  close(s)
                  st = Some(SessState(e.ts_us, e.ts_us, 1))
                case None =>
                  st = Some(SessState(e.ts_us, e.ts_us, 1))
              }
            }
            st.foreach { s =>
              // The watermark is GLOBAL across users: a user whose rows
              // land in a later micro-batch can hold a session whose end
              // is already behind it (other users advanced the clock) —
              // setTimeoutTimestamp throws unless strictly in the future,
              // and no on-time event can ever extend such a session
              // (an extender's ts would precede the watermark), so it
              // closes NOW instead of registering a timeout (r13 ADVICE).
              val endMs = (s.last_us + gapUs) / 1000L
              if (endMs <= state.getCurrentWatermarkMs()) {
                close(s)
                if (state.exists) state.remove()
              } else {
                state.update(s)
                // timeout fires once the event-time watermark passes the
                // session end (milliseconds — the GroupState contract)
                state.setTimeoutTimestamp(endMs)
              }
            }
            out.iterator
          }
        })
  }

  def sequenceMatches(events: DataFrame,
      maxSpanHours: Long = 24): Dataset[SeqMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    val spanUs = maxSpanHours * 3600L * 1000000L
    events.select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("ts_us"), col("event_type"), col("value"))
      .as[SeqEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[SeqEvent], state: GroupState[SeqCarry]) => {
          val carry = state.getOption.getOrElse(SeqCarry("", 0L, "", 0L))
          var t1 = carry.t1; var ts1 = carry.ts1
          var t2 = carry.t2; var ts2 = carry.ts2
          val out = scala.collection.mutable.ArrayBuffer.empty[SeqMatch]
          rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            if (t1 == "view" && t2 == "click" && e.event_type == "purchase" &&
                e.ts_us - ts1 <= spanUs)
              out += SeqMatch(uid, ts1, math.round(e.value * 100))
            t1 = t2; ts1 = ts2
            t2 = e.event_type; ts2 = e.ts_us
          }
          state.update(SeqCarry(t1, ts1, t2, ts2))
          out.iterator
        })
  }
}
