package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one JSON document per line) corpus reader/writer — the
  * interchange format LLM-corpus pipelines actually exchange (every
  * public pretraining corpus ships as compressed JSONL shards; the
  * reference covers parquet (`storage/parquet.py`), JDBC and HTTP JSON
  * (`ingestion/wrds_ingestion.py`) but not line-delimited files).
  *
  * Reading is text-scan + `from_json` against the declared schema with a
  * corrupt-record column, NOT the native JSON datasource: Spark rejects
  * any query on a raw JSON scan that references only the corrupt column
  * (`queryFromRawFilesIncludeCorruptRecordColumnError`), which is
  * precisely what a quarantine split does — parsing explicitly from the
  * text lines keeps both halves of the split queryable from one scan.
  * Malformed lines land in the quarantine frame instead of killing the
  * job (the production posture for crawled shards — a 100 TB crawl
  * always contains broken lines).
  *
  * Scale shape: text lines are splittable, so the scan parallelizes like
  * parquet (with a splittable or no codec); gzip shards are one
  * partition each — at 100 TB use many shards (the layout every public
  * corpus already has) and the read is embarrassingly parallel. Parsing
  * is Jackson row-at-a-time in either formulation (the JSON datasource
  * is not vectorized), so nothing is lost by going through text.
  */
object CorpusSource {

  /** The documents-table schema as a JSONL contract. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val corruptCol = "_corrupt"

  /** Read a JSONL path (file, directory, or glob) against the documents
    * contract: one row per line, parsed fields under `j`, the raw line
    * under `raw_line`; malformed lines carry the raw text in
    * `j._corrupt` with all data fields null.
    */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    parseLines(spark.read.textFile(path).toDF("raw_line"))

  /** The ONE parse projection shared by the batch and streaming readers
    * (the shingleExpr rule: a shared definition cannot drift).
    */
  private def parseLines(lines: DataFrame): DataFrame =
    lines.select(col("raw_line"),
      from_json(col("raw_line"),
        documentsSchema.add(StructField(corruptCol, StringType)),
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corruptCol)).as("j"))

  /** Split a [[readJsonl]] frame into (clean rows conformed to the
    * canonical documents schema, quarantined corrupt raw lines).
    */
  def cleanAndCorrupt(raw: DataFrame): (DataFrame, DataFrame) = {
    val bad = col("j").isNull || col(s"j.$corruptCol").isNotNull
    val clean = graft.Schemas.conformTo(
      raw.filter(!bad).select(col("j.*")).drop(corruptCol),
      documentsSchema)
    (clean, raw.filter(bad).select(col("raw_line")))
  }

  /** Write a documents frame as JSONL shards (one line per doc). */
  def writeJsonl(df: DataFrame, path: String, shards: Int = 1): Unit =
    df.repartition(shards).write.mode("overwrite").json(path)

  /** STREAMING JSONL reader — the continuously-landing-crawl form of
    * [[readJsonl]]: a file-source text stream over the landing
    * directory with the SAME parse expression (one definition, so the
    * batch and stream parses cannot drift), feeding the same
    * [[cleanAndCorrupt]] split. New shards dropped into the directory
    * become micro-batches; quarantine keeps malformed lines flowing to
    * their own sink instead of failing the query — the posture a 24/7
    * ingest needs.
    */
  def readJsonlStream(spark: SparkSession, path: String): DataFrame =
    parseLines(spark.readStream.text(path).toDF("raw_line"))
}
