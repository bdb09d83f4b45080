package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    spark.read.parquet(s"$sfDir/$name.parquet")
}
