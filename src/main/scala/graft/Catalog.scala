package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface: register the testdata tables as temp views so users can
  * address the engine through `spark.sql(...)` as well as the DataFrame
  * API — the two front-ends compile to the same Catalyst plans.
  */
object Catalog {
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { n =>
      scala.util.Try(Tables(spark, sfDir, n).createOrReplaceTempView(n))
    }

  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    registerAll(spark, sfDir)
    spark.sql(query)
  }
}
