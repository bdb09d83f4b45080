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
  // views are global names), repeating the same dir is a no-op. Weak keys
  // so retired sessions don't accumulate.
  private val current =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Returns true when the views were (re)registered, false when the dir
    * was already current and the call was a no-op. A per-table failure
    * propagates with NO dir recorded — the record is cleared BEFORE the
    * loop, because a mid-loop failure leaves a mixed catalog (some views
    * re-pointed, some not): were the old dir still recorded, falling
    * back to it would be a silent no-op over that mixed state. With the
    * record cleared, ANY subsequent call (same dir or the fallback)
    * re-registers everything.
    */
  def registerAll(spark: SparkSession, sfDir: String): Boolean =
    if (current.get(spark) != sfDir) {
      current.remove(spark)
      Tables.names.foreach { n =>
        Tables(spark, sfDir, n).createOrReplaceTempView(n)
      }
      current.put(spark, sfDir)
      true
    } else false

  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    registerAll(spark, sfDir)
    spark.sql(query)
  }
}
