package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver testdata tables (see /root/repo/TESTDATA.md).
  *
  * Each table is a parquet file under the given scale-factor directory.
  * Reads are plain `spark.read.parquet` so Catalyst's datasource V2 scan
  * handles column pruning and filter pushdown — the query code never has
  * to hand-optimize the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Spread a scan across the session's shuffle parallelism before a
    * CPU-heavy narrow stage (per-row hashing, JSON parsing, regex).
    *
    * Why: a parquet file only splits at row-group boundaries, so a
    * small-file/compute-heavy stage otherwise runs on however many row
    * groups the writer happened to emit — one, for this testdata — no
    * matter how many cores the cluster has. The round-trip is one small
    * shuffle of the input rows; the win is moving the expensive
    * projection from p partitions to the full cluster width. At 100 TB
    * inputs arrive many-split and this becomes a cheap ~even-sized
    * re-bucketing; the pattern still pays off whenever upstream
    * cardinality is far below cluster parallelism (e.g. a fetch list
    * feeding a heavy decode).
    *
    * Conditional: when the input already carries at least the session's
    * shuffle parallelism (the 100 TB case — thousands of file splits),
    * this is an identity and NO shuffle is added; the repartition only
    * fires for genuinely under-split inputs.
    *
    * Cost of the probe: `df.rdd` forces one extra physical-planning pass
    * for the input plan (no job runs). That is microseconds for the
    * scan-shaped inputs this wraps — apply it to scans, not to deep
    * mid-query plans, or you pay the planning twice. Under AQE the probe
    * reads the PRE-execution split count, which is the signal we want:
    * AQE can only coalesce partitions below the file-split count, never
    * raise it, so "file splits < cluster width" is decided correctly.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped under two parquet encodings across testdata
      // generations: TIMESTAMP(NANOS) (reads as BIGINT nanos under
      // spark.sql.legacy.parquet.nanosAsLong=true, which every graft entry
      // point and SparkSpec set at session construction) and plain
      // TIMESTAMP(MICROS) with isAdjustedToUTC=false (reads as
      // TIMESTAMP_NTZ under Spark 4's parquet NTZ inference). Dispatch on
      // the type the reader actually produced and normalize both to the
      // session-zone TIMESTAMP the queries and the DuckDB oracle agree on
      // (sessions run UTC, so the NTZ→LTZ cast is value-identity, and the
      // ns→µs truncation matches DuckDB's own nanos handling).
      normalizeEventsTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Normalize an events frame's `ts` to TimestampType micros regardless of
    * which physical encoding the parquet carried (see [[apply]]).
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
    case _ => df
  }
}
