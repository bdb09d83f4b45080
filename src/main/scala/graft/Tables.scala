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

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read nanos as long and truncate to microseconds —
      // the same ns→µs truncation DuckDB applies, so both engines see
      // identical instants.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
