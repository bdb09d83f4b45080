package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Methodology (round 4, per VERDICT r3 item 1): each query executes
  * `SPARK_GRAFT_BENCH_RUNS` times (default 3) and the reported per-query
  * number is the MIN of its runs; `value` is the total-of-mins. Raw runs are
  * kept under `"runs"` so the spread (shared-host noise) stays auditable.
  * A single-run bench on this host has shown 7x spikes on unchanged
  * single-scan plans (f5_string_normalize 1.9s -> 13.3s in r3); min-of-N
  * measures the plan, not the neighbor's compile job.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/file-index paths so the first measured query
    // doesn't absorb ~3s of one-time cost.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.names.foreach(n =>
      scala.util.Try(Tables(spark, sfDir, n).selectExpr("count(*)").collect()))
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = (1 to nRuns).map { _ =>
        val t0 = System.nanoTime()
        // noop sink materializes every row and column of the result —
        // unlike count(), which lets Catalyst prune sorts and projections.
        // A failed query is recorded loudly instead of silently scoring ~0 s
        // (round 1 flagged the swallowed Throwable).
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
            errors(name) = msg
            System.err.println(s"BENCH ERROR $name -> $msg")
        }
        (System.nanoTime() - t0) / 1e9
      }
      (name, runs.min, runs)
    }
    val qs = results.map { case (k, m, _) => s"\"" + k + "\":" + m }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, _, rs) =>
      s"\"" + k + "\":" + rs.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      Verify.q(k) + ":" + Verify.q(v) // full control-char-safe JSON escape
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","method":"min-of-$nRuns","queries":$qs,"runs":$raw,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
