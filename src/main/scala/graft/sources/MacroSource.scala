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

/** Live FRED implementation over `java.net.http` (S3,
  * `wrds_ingestion.py:946-981`): one driver-side GET of
  * `/fred/series/observations?series_id=…&observation_start=…&
  * observation_end=…&file_type=json[&api_key=…]` per series — the same
  * driver-side boundary as the reference's `requests.get`; payload sizes
  * are a few thousand observations per series, so the driver fetch is not
  * a scale concern. Everything after the payload lands is the shared
  * [[FredJson.parse]] Spark plan. A failed series degrades to no rows for
  * that series (the reference logs and continues, `:975-979`); the api key
  * resolves via [[graft.Config.loadFredApiKey]] (env first, then
  * `config/fred_credentials.yml`).
  *
  * `baseUrl` is injectable so the spec drives the full HTTP + parse path
  * against an in-process fixture server in the zero-egress environment.
  */
class HttpMacroSource(spark: SparkSession,
    baseUrl: String = "https://api.stlouisfed.org/fred/series/observations",
    apiKey: Option[String] = None,
    timeout: java.time.Duration = java.time.Duration.ofSeconds(30))
  extends MacroSource {

  private lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(timeout).build()

  // resolved once per source instance — not once per series fetch
  private lazy val resolvedKey: Option[String] =
    apiKey.orElse(graft.Config.loadFredApiKey())

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)

  private def fetch(seriesId: String, start: String, end: String): Option[String] = {
    val url = s"$baseUrl?series_id=${enc(seriesId)}" +
      s"&observation_start=${enc(start)}&observation_end=${enc(end)}" +
      "&file_type=json" + resolvedKey.map(k => s"&api_key=${enc(k)}").getOrElse("")
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(timeout).GET().build()
    // log-and-continue per series, like the reference (`:975-979`) — a
    // silent empty macro frame with no diagnostics is undebuggable
    scala.util.Try(
      client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    ) match {
      case scala.util.Success(resp) if resp.statusCode() / 100 == 2 =>
        Some(resp.body())
      case scala.util.Success(resp) =>
        System.err.println(
          s"[macro] FRED fetch for $seriesId returned HTTP ${resp.statusCode()}; skipping series")
        None
      case scala.util.Failure(e) =>
        // exception class only — java.net.http messages can embed the full
        // request URL, whose api_key query parameter is a credential
        System.err.println(
          s"[macro] FRED fetch for $seriesId failed (${e.getClass.getSimpleName}); skipping series")
        None
    }
  }

  def series(seriesIds: Seq[String], start: String, end: String): DataFrame = {
    val rows = seriesIds.flatMap(sid =>
      fetch(sid, start, end).map(payload => (sid, payload)))
    import spark.implicits._
    if (rows.isEmpty) {
      // the reference's "FRED API returned no data" path (:977-979)
      FredJson.parse(Seq.empty[(String, String)].toDF("series_name", "payload"))
    } else FredJson.parse(rows.toDF("series_name", "payload"))
  }
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
