package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scoped caching for query-internal projections.
  *
  * Query builders cache small hashed projections that are consumed by
  * several join sides (see BASELINE.md methodology notes). Because the
  * builders return LAZY frames, they cannot unpersist after "the" action —
  * the caller owns execution. An unscoped `.cache()` therefore accumulates
  * executor storage forever in a long-lived session (Bench/Verify loops,
  * notebooks) — ADVICE.md round 2.
  *
  * `scoped(tag, df)` bounds that: each call unpersists whatever the
  * PREVIOUS call with the same (session, tag) cached, so a session holds
  * at most one live cache per query tag no matter how many times the
  * query is rebuilt. Sessions are weak keys; a retired session's entries
  * are collected with it.
  */
object Caches {
  private val held =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  def scoped(tag: String, df: DataFrame): DataFrame = {
    val perSession = held.synchronized {
      held.computeIfAbsent(df.sparkSession,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    }
    val cached = df.cache()
    val prev = perSession.put(tag, cached)
    // Non-blocking: in-flight jobs over the old cache just recompute.
    if (prev != null && (prev ne cached)) prev.unpersist(false)
    cached
  }
}
