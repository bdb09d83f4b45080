package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Methodology (round 6, per VERDICT r5 items 6 and ADVICE-3):
  *
  *   - `SPARK_GRAFT_BENCH_SESSIONS` (default 2) SEPARATE SparkSessions run
  *     back-to-back, each executing every query `SPARK_GRAFT_BENCH_RUNS`
  *     times (default 3). A whole-window host spike (r3 saw 7x on
  *     unchanged single-scan plans) now self-identifies in the artifact:
  *     `session_totals` diverging while per-query mins agree means noise,
  *     not a regression.
  *   - `spark.catalog.clearCache()` runs before EVERY measured run, so the
  *     scoped-cache queries (pipeline_*, dd_embedding_*, dd_semdedup_banded)
  *     pay cache population in every run instead of reading a warm cache in
  *     runs 2..N — the min now measures the plan a cold cluster would run.
  *     `value_first_runs` (run 1 of each query in session 1, JVM-cold-ish)
  *     stays on record for continuity with rounds <= 5.
  *   - Per-query number is the MIN of its SUCCESSFUL runs across all
  *     sessions (a failed run records near-zero elapsed; letting it win
  *     the min would resurrect round 1's "failed query scores ~0 s" bug —
  *     an all-runs-failed query reports its max elapsed instead, and the
  *     errors map stays the loud signal). `value` is the total-of-mins;
  *     raw per-session runs are kept under `"runs"` so the spread
  *     (shared-host noise) stays auditable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val nSessions = sys.env.getOrElse("SPARK_GRAFT_BENCH_SESSIONS", "2").toInt.max(1)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val names = SparkEntry.queries.toSeq.sortBy(_._1).map(_._1)

    // sessionRuns(s)(name) = per-run (elapsed sec, succeeded) for session s
    val sessionRuns: Seq[Map[String, Seq[(Double, Boolean)]]] =
      (1 to nSessions).map { _ =>
        val spark = SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.sql.legacy.parquet.nanosAsLong", "true")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        // Warm up the JVM/codegen/file-index paths so the first measured
        // query doesn't absorb ~3s of one-time cost.
        spark.range(1000000L).selectExpr("sum(id)").collect()
        Tables.names.foreach(n =>
          scala.util.Try(Tables(spark, sfDir, n).selectExpr("count(*)").collect()))
        val perQuery = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
          val runs = (1 to nRuns).map { _ =>
            // every run pays scoped-cache population: warm cached reads in
            // runs 2..N are not the number a cold cluster would see
            spark.catalog.clearCache()
            val t0 = System.nanoTime()
            // noop sink materializes every row and column of the result —
            // unlike count(), which lets Catalyst prune sorts and projections.
            // A failed query is recorded loudly instead of silently scoring
            // ~0 s (round 1 flagged the swallowed Throwable).
            val ok =
              try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
              catch {
                case e: Throwable =>
                  val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
                  errors(name) = msg
                  System.err.println(s"BENCH ERROR $name -> $msg")
                  false
              }
            ((System.nanoTime() - t0) / 1e9, ok)
          }
          name -> (runs: Seq[(Double, Boolean)])
        }.toMap
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        perQuery
      }

    // min over SUCCESSFUL runs only, pooled across sessions: a fast failure
    // must not undercut the real cost. All-failed -> max elapsed (never a
    // flattering number).
    def minOf(runs: Seq[(Double, Boolean)]): Double = {
      val good = runs.filter(_._2).map(_._1)
      if (good.nonEmpty) good.min else runs.map(_._1).max
    }
    val mins = names.map(n => n -> minOf(sessionRuns.flatMap(_(n))))
    val total = mins.map(_._2).sum
    val sessionTotals = sessionRuns.map(sr => names.map(n => minOf(sr(n))).sum)
    val sessionFirstRuns = sessionRuns.map(sr => names.map(n => sr(n).head._1).sum)
    val qs = mins.map { case (k, m) => s"\"" + k + "\":" + m }
      .mkString("{", ",", "}")
    val raw = names.map { n =>
      val perSession = sessionRuns.map(_(n).map(_._1).mkString("[", ",", "]"))
      s"\"" + n + "\":" + perSession.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      Verify.q(k) + ":" + Verify.q(v) // full control-char-safe JSON escape
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","method":"min-of-$nRuns-x$nSessions-sessions-coldcache","value_first_runs":${sessionFirstRuns.head},"session_totals":${sessionTotals.mkString("[", ",", "]")},"session_first_runs":${sessionFirstRuns.mkString("[", ",", "]")},"queries":$qs,"runs":$raw,"errors":$errJson,"sf":"$sfDir"}""")
  }
}
