package graft

import org.apache.spark.sql.SparkSession

/** Quick demo main validating the [[LocalParquetDataHandler]] against an
  * ingested data root — the twin of the reference's
  * `notebooks/demo_data_handler.py:1-25` (same queries, same "run after
  * ingesting" contract).
  *
  * {{{
  *   sbt "runMain graft.Demo [/path/to/data/root]"
  * }}}
  * With no argument the root resolves exactly like the reference's
  * `default_data_root()` ([[Config.resolveDataRoot]]).
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(Config.resolveDataRoot().toString)
    if (!java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(root, "data_processed"))) {
      System.err.println(
        s"No ingested data under $root — run graft.Ingest first " +
          "(see IngestSpec for the synthetic end-to-end example).")
      sys.exit(1)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-demo")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val handler = new LocalParquetDataHandler(spark, root)

    println("Universe on 2020-01-02:")
    handler.getUniverse(Some("2020-01-02")).show(5, truncate = false)

    println("Prices from 2020-01-01 to 2020-02-01:")
    handler.getPrices(None, Some("2020-01-01"), Some("2020-02-01"), None)
      .show(5, truncate = false)

    println("Returns from 2020-01-01 to 2020-02-01:")
    handler.getReturns(None, Some("2020-01-01"), Some("2020-02-01"))
      .show(5, truncate = false)

    spark.stop()
  }
}
