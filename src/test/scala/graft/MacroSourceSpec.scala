package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.sources.HttpMacroSource

/** Drives [[graft.sources.HttpMacroSource]]'s full HTTP + parse path
  * against an in-process JDK HttpServer fixture (the zero-egress twin of
  * the FRED endpoint, `wrds_ingestion.py:946-981`): query-parameter
  * shape, per-series payloads, "." missing-marker filtering, and the
  * degrade-to-empty path on server errors.
  */
class MacroSourceSpec extends SparkSpec {

  private def withServer[T](handler: HttpExchange => Unit)(body: String => T): T = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/fred/series/observations", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = handler(ex)
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/fred/series/observations")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("HttpMacroSource fetches per-series JSON and parses observations") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    withServer { ex =>
      val q = ex.getRequestURI.getQuery
      seen.synchronized { seen += q }
      val sid = q.split("&").find(_.startsWith("series_id="))
        .map(_.stripPrefix("series_id=")).getOrElse("?")
      respond(ex, 200,
        s"""{"observations": [
           |  {"date": "2020-01-01", "value": "100.5"},
           |  {"date": "2020-02-01", "value": "."},
           |  {"date": "2020-03-01", "value": "${if (sid == "UNRATE") "3.5" else "101.25"}"}
           |]}""".stripMargin)
    } { url =>
      val src = new HttpMacroSource(spark, url, apiKey = Some("k123"))
      val out = src.series(Seq("CPIAUCSL", "UNRATE"), "2020-01-01", "2020-12-31")
        .orderBy("series_name", "date").collect()
      // "." rows are dropped by the numeric-parse filter (P8)
      assert(out.length == 4)
      assert(out.map(_.getAs[String]("series_name")).toSeq ==
        Seq("CPIAUCSL", "CPIAUCSL", "UNRATE", "UNRATE"))
      assert(out(3).getAs[Double]("value") == 3.5)
      // request shape: series_id, observation window, file_type, api key
      val qs = seen.synchronized(seen.toList)
      assert(qs.size == 2)
      qs.foreach { q =>
        assert(q.contains("observation_start=2020-01-01"))
        assert(q.contains("observation_end=2020-12-31"))
        assert(q.contains("file_type=json"))
        assert(q.contains("api_key=k123"))
      }
    }
  }

  test("HttpMacroSource degrades failed series to no rows, like the reference") {
    withServer { ex =>
      val q = ex.getRequestURI.getQuery
      if (q.contains("series_id=UNRATE")) respond(ex, 500, "boom")
      else respond(ex, 200,
        """{"observations": [{"date": "2020-01-01", "value": "7.0"}]}""")
    } { url =>
      val src = new HttpMacroSource(spark, url, apiKey = Some("k"))
      val out = src.series(Seq("CPIAUCSL", "UNRATE"), "2020-01-01", "2020-12-31")
        .collect()
      assert(out.length == 1)
      assert(out.head.getAs[String]("series_name") == "CPIAUCSL")
    }
  }

  test("HttpMacroSource with every series failing yields a schema-stable empty") {
    withServer(ex => respond(ex, 404, "nope")) { url =>
      val src = new HttpMacroSource(spark, url, apiKey = Some("k"))
      val out = src.series(Seq("CPIAUCSL"), "2020-01-01", "2020-12-31")
      assert(out.columns.toSeq == Seq("date", "series_name", "value"))
      assert(out.count() == 0)
    }
  }
}
