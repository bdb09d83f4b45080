package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Macro timeseries source (S3, `wrds_ingestion.py:946-981`): the reference
  * fetches `/fred/series/observations` JSON per series over HTTPS. The
  * fetch itself is a driver-side boundary; everything after the payload
  * lands — JSON field extraction (F13), numeric-parse filtering of FRED's
  * "." missing markers (P8), union across series (U1) — is a Spark plan
  * and lives in [[FredJson.parse]] so it is testable with no network.
  */
trait MacroSource {
  /** Long-format (date, series_name, value) frame for the given series. */
  def series(seriesIds: Seq[String], start: String, end: String): DataFrame
}

object FredJson {

  /** FRED observations payload schema: `{"observations": [{"date": …,
    * "value": …}, …]}` (`wrds_ingestion.py:965-967`).
    */
  val payloadSchema: StructType = StructType(Seq(
    StructField("observations", ArrayType(StructType(Seq(
      StructField("date", StringType), StructField("value", StringType)))))))

  /** Parse raw (series_name, payload-json) rows into the long macro frame:
    * from_json → explode → numeric-parse filter (FRED encodes missing as
    * "." — `wrds_ingestion.py:968-972`; `try_cast` drops any non-numeric).
    */
  def parse(payloads: DataFrame): DataFrame =
    payloads
      .select(col("series_name"),
        explode(from_json(col("payload"), payloadSchema)("observations"))
          .as("obs"))
      .select(col("obs.date").cast("timestamp").as("date"),
        col("series_name"),
        expr("try_cast(obs.value AS DOUBLE)").as("value"))
      .filter(col("value").isNotNull)
}

/** Deterministic offline macro source for the zero-egress environment:
  * synthesizes the FRED JSON payloads the HTTP call would have returned
  * (month-start observations, a few "." missing markers) and runs them
  * through the real [[FredJson.parse]] plan.
  */
class StubMacroSource(spark: SparkSession) extends MacroSource {

  def series(seriesIds: Seq[String], start: String, end: String): DataFrame = {
    val rows = seriesIds.map { sid =>
      val base = math.abs(sid.hashCode % 100) + 50
      val obs = (0 until 24).map { i =>
        val month = i % 12 + 1
        val year = 2020 + i / 12
        val value = if (i % 11 == 10) "\".\"" else s""""${base + i * 0.25}""""
        f"""{"date": "$year-$month%02d-01", "value": $value}"""
      }.mkString(",")
      (sid, s"""{"observations": [$obs]}""")
    }
    import spark.implicits._
    FredJson.parse(rows.toDF("series_name", "payload"))
      .filter(col("date").between(
        lit(start).cast("timestamp"), lit(end).cast("timestamp")))
  }
}
