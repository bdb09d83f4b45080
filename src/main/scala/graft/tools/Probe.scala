package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $tag%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      spark.catalog.clearCache()
      val d = graft.Tables.spread(
          graft.Tables(spark, dir, "documents"))
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), col("lang"), col("toks"))
      val sh0 = d
        .withColumn("shs", expr(
          s"transform(${graft.queries.Text.shingleExpr(3)}, s -> CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT))"))
        .select(col("doc_id"), expr("size(shs)").cast("long").as("m"),
          col("shs"))
      val shC = sh0.cache()
      time("populate")(shC.write.format("noop").mode("overwrite").save())
      val ds = shC.select(col("doc_id"), col("m"), explode(col("shs")).as("h"))
      val dfreq = ds.groupBy("h").agg(count(lit(1)).as("df"))
      val wD = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("df").asc, col("h").asc)
      val prefixes = ds.join(dfreq, "h")
        .withColumn("rn", row_number().over(wD))
        .filter(col("rn") <= expr("m DIV 2 + 1"))
        .select(col("h"), col("doc_id"), col("m"))
      time("prefixes")(prefixes.write.format("noop").mode("overwrite").save())
      val cands = prefixes.as("x").join(prefixes.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id") &&
          col("x.m") * 2 >= col("y.m") && col("y.m") * 2 >= col("x.m"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct()
      time("cands")(cands.write.format("noop").mode("overwrite").save())
      println("cands count = " + time("cands-count")(cands.count()))
      val verified = cands
        .join(ds.select(col("doc_id").as("id_a"), col("m").as("n_a"),
          col("h")), "id_a")
        .join(ds.select(col("doc_id").as("id_b"), col("m").as("n_b"),
          col("h")), Seq("id_b", "h"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(count(lit(1)).as("inter"))
        .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
        .filter(col("inter") * 2 >= col("uni"))
        .select(col("id_a"), col("id_b"), col("inter"), col("uni"),
          (col("inter").cast("double") / col("uni").cast("double"))
            .as("jaccard"))
        .orderBy("id_a", "id_b")
      time("verify-full")(verified.write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
      time("end-to-end")(graft.queries.Text.ddPpjoin(spark, dir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
