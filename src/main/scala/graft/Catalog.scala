package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface: register the testdata tables as temp views so users can
  * address the engine through `spark.sql(...)` as well as the DataFrame
  * API — the two front-ends compile to the same Catalyst plans.
  *
  * Registration happens once per (session, dir): re-resolving and
  * re-registering all tables on every `sql` call cost ~2 s per query in
  * round 1's bench (VERDICT.md "What's wrong" #5).
  */
object Catalog {
  // Session → currently-registered dir: switching dirs re-registers (the
  // views are global names), repeating the same dir is a no-op.
  private val current =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Returns true when the views were (re)registered, false when the dir
    * was already current and the call was a no-op.
    */
  def registerAll(spark: SparkSession, sfDir: String): Boolean =
    if (current.put(spark, sfDir) != sfDir) {
      Tables.names.foreach { n =>
        scala.util.Try(Tables(spark, sfDir, n).createOrReplaceTempView(n))
      }
      true
    } else false

  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    registerAll(spark, sfDir)
    spark.sql(query)
  }
}
