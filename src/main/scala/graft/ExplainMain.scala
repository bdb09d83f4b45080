package graft
import org.apache.spark.sql.SparkSession
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC") // ADVICE r7-1: events NTZ semantics
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // NOTE: builders with driver-side actions (dd_dup_clusters'
    // contraction loop, sim_sq_int8's scale reduce) run real jobs even
    // though only the plan is printed.
    args.drop(1).foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries.get(name) match {
        case Some(fn) => fn(spark, args(0)).explain("formatted")
        case None => println(
          s"unknown query '$name' — known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      }
    }
    spark.stop()
  }
}
