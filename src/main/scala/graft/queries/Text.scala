package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis and deduplication operators over the `documents` table —
  * the training-data-pipeline extensions (SURVEY.md §7.5).
  *
  * Everything here is pure native-function Spark (split / regexp /
  * higher-order array functions), so the whole pipeline stays inside
  * whole-stage codegen with no UDFs — at 100 TB these run as a single
  * scan + narrow projection per document, embarrassingly parallel, with
  * shuffles only at the final (small) aggregations or candidate joins.
  */
object Text {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** Quality scoring (length / punctuation / stopword ratios): the standard
    * cheap heuristics a pretraining filter computes per document. Single
    * float division per ratio keeps every value bit-deterministic.
    */
  def txQualityScore(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), col("lang"),
        expr("size(split(text, ' '))").as("n_tokens"),
        length(col("text")).as("len_chars"),
        expr("length(regexp_replace(text, '[^A-Za-z0-9]', ''))").as("n_alnum"),
        expr("size(filter(split(lower(text), ' '), t -> array_contains(array('the','a','of','and','to','in','is','it','that','for'), t)))")
          .as("n_stop"))
      .withColumn("avg_token_len",
        (col("len_chars") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("alpha_ratio", col("n_alnum").cast("double") / col("len_chars"))
      .orderBy("doc_id")

  /** Token counting: whitespace tokens plus a BPE-ish regex token count
    * (letter runs, digits, single punctuation), aggregated per source.
    */
  def txTokenCount(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("source"),
        expr("size(split(text, ' '))").as("ws_tokens"),
        expr("size(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]', 0))")
          .as("re_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws_tokens").as("total_ws_tokens"),
        sum("re_tokens").as("total_re_tokens"),
        max("ws_tokens").as("max_ws_tokens"))
      .orderBy("source")

  /** Language identification: deterministic stopword-lexicon scoring with a
    * CJK codepoint check, reported as a (label × prediction) confusion
    * matrix. On this synthetic corpus every language draws from the same
    * English-ish wordlist, so the matrix mostly predicts 'en' — the point
    * is the operator, exercised end-to-end and oracle-checked.
    */
  def txLangId(spark: SparkSession, dir: String): DataFrame = {
    val scored = docs(spark, dir)
      .withColumn("toks", expr("split(lower(text), ' ')"))
      .withColumn("en_h", expr("size(filter(toks, t -> array_contains(array('the','a','of','and','to','in','is','it','that','for'), t)))"))
      .withColumn("es_h", expr("size(filter(toks, t -> array_contains(array('el','la','de','los','las','y','en','que','un','una'), t)))"))
      .withColumn("de_h", expr("size(filter(toks, t -> array_contains(array('der','die','das','und','ist','ein','eine','zu','den','von'), t)))"))
      .withColumn("fr_h", expr("size(filter(toks, t -> array_contains(array('le','la','les','de','et','un','une','est','en','que'), t)))"))
      .withColumn("cjk", expr("length(regexp_replace(text, '[^\\u4e00-\\u9fff]', ''))"))
      .withColumn("predicted",
        expr("""CASE WHEN cjk > 0 THEN 'zh'
                     WHEN en_h >= es_h AND en_h >= de_h AND en_h >= fr_h THEN 'en'
                     WHEN es_h >= de_h AND es_h >= fr_h THEN 'es'
                     WHEN de_h >= fr_h THEN 'de'
                     ELSE 'fr' END"""))
    scored.groupBy("lang", "predicted")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "predicted")
  }

  /** Document fingerprinting: polynomial rolling hash over the codepoint
    * stream, `h = (h*31 + cp) mod 1e9+7`, entirely in exact integer
    * arithmetic so any engine agrees bit-for-bit.
    */
  def txFingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .filter(col("doc_id") < 300)
      .select(col("doc_id"),
        expr("aggregate(sequence(1, length(text)), 0L, (h, i) -> (h * 31 + ascii(substring(text, i, 1))) % 1000000007)")
          .as("fingerprint"))
      .orderBy("doc_id")

  /** Deterministic key-addressed sampling (beyond-reference extension,
    * SURVEY.md §7.5): reproducible subsetting with no RNG state — the
    * same sample on every run, any partitioning, any engine. A ~12.5%
    * Bernoulli sample selected by the md5 prefix of the stable doc id,
    * and a stratified per-language sample of the 10 lowest-hash docs,
    * both from one scan + one window (no join). For duplicate-consistent
    * (content-addressed) selection, hash the text instead, as
    * [[ddExact]] does.
    */
  def txHashSample(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("h", expr("md5(cast(cast(doc_id AS STRING) AS BINARY))"))
      .withColumn("rn", expr(
        "row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)"))
      .groupBy("lang")
      .agg(
        sum(when(expr("substring(h, 1, 1) < '2'"), 1L).otherwise(0L))
          .as("n_bernoulli"), // 2/16 of the hex prefix space
        sum(when(col("rn") <= 10, 1L).otherwise(0L)).as("n_stratified"),
        min(when(col("rn") <= 10, col("doc_id"))).as("min_sampled_id"))
      .orderBy("lang")

  /** Exact deduplication stats: per language, distinct-text and distinct-md5
    * counts (the hash-groupBy dedup a 100 TB pipeline runs first — one
    * shuffle on the 16-byte digest, never on the document text itself).
    */
  def ddExact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("lang"), expr("md5(cast(text AS BINARY))").as("h"), col("text"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_distinct_texts"),
        countDistinct(col("h")).as("n_distinct_md5"),
        (count(lit(1)) - countDistinct(col("h"))).as("n_dup_rows"))
      .orderBy("lang")

  /** N-gram (token-set) Jaccard near-dedup: candidate pairs restricted to
    * the same (lang, length-bucket) block — the blocking step that turns an
    * O(n²) all-pairs compare into small per-block joins, which is the only
    * shape that survives 100 TB. Reports per-language candidate and
    * near-dup counts plus the maximum observed similarity.
    */
  def ddNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // Token sets are hashed to longs before the pair join: set-intersection
    // COUNTS are what the query returns (and what the oracle compares, on
    // the raw strings). A 64-bit hash collision would shrink a count and
    // diverge from the string-side oracle — probability ~|tokens|²/2⁶⁵,
    // negligible here; the payoff is per-pair intersects on 8-byte
    // compares instead of string equality.
    val d = docs(spark, dir)
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / lit(100)).cast("long").as("bucket"),
        expr("array_distinct(transform(split(text, ' '), t -> xxhash64(t)))").as("toks"))
    val a = d.select(col("doc_id").as("id_a"), col("lang"), col("bucket"),
      col("toks").as("toks_a"))
    val b = d.select(col("doc_id").as("id_b"), col("lang").as("lang_b"),
      col("bucket").as("bucket_b"), col("toks").as("toks_b"))
    a.join(b, col("lang") === col("lang_b") && col("bucket") === col("bucket_b") &&
        col("id_a") < col("id_b"))
      .withColumn("inter", expr("size(array_intersect(toks_a, toks_b))"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (expr("size(toks_a)") + expr("size(toks_b)") - col("inter")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_candidate_pairs"),
        sum(when(col("jaccard") >= 0.5, 1L).otherwise(0L)).as("n_near_dups"),
        max("jaccard").as("max_jaccard"))
      .orderBy("lang")
  }

  /** The composed corpus-cleaning pipeline — what a pretraining data job
    * actually runs, as ONE declarative plan: quality gate (token count +
    * alphanumeric ratio) → exact dedup (min doc_id per md5) → blocked
    * near-dedup (drop any doc with token-Jaccard ≥ 0.5 against a
    * lower-id doc in its (lang, length-bucket) block) → per-language
    * survivor stats. Every stage is a narrow transform or a blocked
    * join, so the whole pipeline is a handful of bounded shuffles at any
    * scale.
    */
  def pipelineCleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir)
      .withColumn("toks", expr("split(text, ' ')"))
      .withColumn("n_tokens", expr("size(toks)"))
      .withColumn("alpha_ratio",
        expr("CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '')) AS DOUBLE) / length(text)"))
      .filter(col("n_tokens") >= 30 && col("alpha_ratio") > 0.7)
    val exactDeduped = base
      .withColumn("h", expr("md5(cast(text AS BINARY))"))
      .withColumn("rn", expr(
        "row_number() OVER (PARTITION BY h ORDER BY doc_id)"))
      .filter(col("rn") === 1)
      .drop("h", "rn")
    val blocked = exactDeduped.select(col("doc_id"), col("lang"),
      (col("n_chars") / lit(100)).cast("long").as("bucket"),
      expr("array_distinct(transform(toks, t -> xxhash64(t)))").as("tokset"),
      col("n_tokens"))
      // evaluated by both self-join sides and the anti join — cache, or
      // the whole quality+md5+window chain runs three times
      .cache()
    val dupIds = blocked.as("x").join(blocked.as("y"),
        col("x.lang") === col("y.lang") && col("x.bucket") === col("y.bucket") &&
          col("y.doc_id") < col("x.doc_id"))
      .withColumn("inter", expr("size(array_intersect(x.tokset, y.tokset))"))
      .filter(col("inter").cast("double") /
        (expr("size(x.tokset)") + expr("size(y.tokset)") - col("inter")) >= 0.5)
      .select(col("x.doc_id").as("doc_id")).distinct()
    blocked.join(dupIds, Seq("doc_id"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs_kept"),
        sum("n_tokens").as("total_tokens"))
      .orderBy("lang")
  }

  /** MinHash + LSH near-dedup (no SQL oracle — xxhash64 is Spark-native;
    * correctness is covered by the ScalaTest planted-duplicate spec).
    * Shingle (3-token) → 16 minhash slots → 4 bands of 4 → band-hash
    * bucket join → true-Jaccard confirmation on candidates only. The
    * banded self-join is the 100 TB path: candidates meet only inside a
    * (band, signature) bucket, so the shuffle is on short hashes.
    */
  def ddMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    // Shingles never materialize as strings: tokens hash once, then each
    // 3-shingle is a hash-of-three-longs — no concat allocation, and the
    // downstream Jaccard confirmation compares 8-byte values.
    val shingled = docs(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("th", expr("transform(toks, t -> xxhash64(t))"))
      .withColumn("shingles",
        expr("transform(sequence(0, size(th) - 3), i -> xxhash64(th[i], th[i+1], th[i+2]))"))
      .select(col("doc_id"), col("lang"), col("shingles"))
    // The 16-slot signature is the expensive expression (16 × |shingles|
    // seeded xxhash64 evaluations per doc). Cached so the banding pass
    // and pushed-down filters evaluate it exactly once. (An arithmetic
    // permutation family — hash once, permute 16× with (2j+1)*h+b mod
    // 2^31-1 — was measured SLOWER here: higher-order-function lambdas
    // are interpreted, so lambda-invocation count dominates and the extra
    // permutation pass outweighs the saved string hashing.)
    val sigs = shingled.select(col("doc_id"),
      expr("transform(sequence(0, 15), j -> array_min(transform(shingles, s -> xxhash64(s, j))))")
        .as("sig")).cache()
    val bands = sigs.select(col("doc_id"),
        posexplode(expr("transform(sequence(0, 3), b -> xxhash64(sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3]))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val pairs = bands.as("x").join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.band_hash" === $"y.band_hash" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("id_a"), $"y.doc_id".as("id_b")).distinct()
    // Confirmation re-reads only the (cheap) shingle arrays, not the sigs.
    val withSets = pairs
      .join(shingled.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(shingled.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("inter", expr("size(array_intersect(array_distinct(sh_a), array_distinct(sh_b)))"))
      .withColumn("jaccard", col("inter").cast("double") /
        (expr("size(array_distinct(sh_a))") + expr("size(array_distinct(sh_b))") - col("inter")))
    withSets.agg(count(lit(1)).as("n_candidate_pairs"),
      sum(when(col("jaccard") >= 0.8, 1L).otherwise(0L)).as("n_confirmed_dups"))
  }

  /** SimHash near-dedup (no SQL oracle — xxhash64). 64-bit simhash from
    * token hashes; docs pair up only within the same 16-bit prefix block
    * (banding again), then Hamming distance via bit_count(xor).
    */
  def ddSimhash(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    graft.functions.VectorFunctions.ensureRegistered(spark)
    // simhash64 is the codegen'd expression (one tight loop per doc); the
    // tiny (doc_id, simhash) projection is still cached so the self-join's
    // two sides and pushed-down join-key filters evaluate it once.
    val hashed = docs(spark, dir)
      .withColumn("hs", expr("transform(array_distinct(split(text, ' ')), t -> xxhash64(t))"))
      .withColumn("simhash", expr("simhash64(hs)"))
      .select(col("doc_id"), col("lang"), col("simhash"),
        expr("shiftright(simhash, 48)").as("block"))
      .cache()
    val p = hashed.as("x").join(hashed.as("y"),
        $"x.block" === $"y.block" && $"x.doc_id" < $"y.doc_id")
      .withColumn("hamming", expr("bit_count(x.simhash ^ y.simhash)"))
    p.groupBy($"x.lang".as("lang"))
      .agg(count(lit(1)).as("n_block_pairs"),
        sum(when(col("hamming") <= 16, 1L).otherwise(0L)).as("n_close_pairs"),
        min("hamming").as("min_hamming"))
      .orderBy("lang")
  }
}
