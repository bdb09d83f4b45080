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
  * `scoped(tag, df)` bounds that: each call releases what the PREVIOUS
  * call with the same (session, tag) cached — but only when the plan
  * actually CHANGED. Spark's CacheManager keys cached data by normalized
  * plan equality, not Dataset identity, so re-invoking a builder with
  * the same parameters makes `cache()` a no-op on the existing entry;
  * unpersisting the "previous" frame then would evict the very entry the
  * new frame points at (and recompute the projection once per join side
  * — the cost the cache exists to avoid).
  *
  * Bookkeeping holds sessions weakly and frames via `WeakReference` (a
  * strongly-held DataFrame would pin its own SparkSession — the
  * documented WeakHashMap value→key trap — and retired sessions would
  * never collect). A frame collected before the next call just skips the
  * explicit unpersist: its cache entry dies with the session, or is
  * reused in place when the rebuilt plan is equal.
  */
object Caches {
  private val held =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String,
          java.lang.ref.WeakReference[DataFrame]]]())

  def scoped(tag: String, df: DataFrame): DataFrame = {
    val perSession = held.synchronized {
      held.computeIfAbsent(df.sparkSession,
        _ => new java.util.concurrent.ConcurrentHashMap[String,
          java.lang.ref.WeakReference[DataFrame]]())
    }
    val cached = df.cache()
    val prevRef = perSession.put(tag, new java.lang.ref.WeakReference(cached))
    val prev = if (prevRef == null) null else prevRef.get()
    // Non-blocking: in-flight jobs over the old cache just recompute.
    // Same-plan rebuilds share one CacheManager entry — keep it.
    if (prev != null && (prev ne cached) &&
        !prev.queryExecution.analyzed.sameResult(cached.queryExecution.analyzed)) {
      prev.unpersist(false)
    }
    cached
  }
}
