package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Schemas, Transforms}

/** Abstraction over the WRDS Postgres boundary (S2, `wrds_ingestion.py:99-105`).
  *
  * Every method returns the raw frame the matching `db.raw_sql` call
  * produced; all heavy filtering (permno IN-lists, date BETWEEN) stays in
  * the remote SQL exactly as the reference pushes it
  * (`wrds_ingestion.py:113-114,183-184,220,348,370,427,497-499,590-593`).
  * Implementations: [[JdbcEquitySource]] for a live warehouse,
  * [[SnapshotEquitySource]] for parquet snapshots (the zero-egress path),
  * [[SyntheticEquitySource]] for deterministic in-memory test data.
  */
trait EquitySource {
  /** `crsp.dsp500list` membership intervals (`wrds_ingestion.py:108-116`). */
  def universe(start: String, end: String): DataFrame
  /** `crsp.dsenames` distinct name records (`wrds_ingestion.py:119-129`). */
  def nameRecords(permnos: Seq[Long]): DataFrame
  /** CCM link × `g_company` IPO dates (`wrds_ingestion.py:132-152`). */
  def ipoDates(permnos: Seq[Long]): DataFrame
  /** `crsp.dsf` daily prices (`wrds_ingestion.py:169-189`). */
  def pricesDaily(permnos: Seq[Long], start: String, end: String): DataFrame
  /** `crsp.StkDelists` delist events (`wrds_ingestion.py:326-380`). */
  def delistEvents(permnos: Seq[Long], start: String, end: String): DataFrame
  /** `crsp.ccmxpf_linktable` CCM links (`wrds_ingestion.py:483-491`). */
  def ccmLinks(permnos: Seq[Long], end: String): DataFrame
  /** `comp.funda` fundamentals (`wrds_ingestion.py:493-513`). */
  def fundamentals(gvkeys: Seq[String], start: String, end: String): DataFrame
  /** `tr_ibes.id` identity records (`wrds_ingestion.py:567-580`). */
  def ibesIds(end: String): DataFrame
  /** `crsp.dsenames` CUSIP name history (`wrds_ingestion.py:584-598`). */
  def crspCusipNames(permnos: Seq[Long], start: String, end: String): DataFrame
  /** `tr_ibes.recdsum` consensus summary (`wrds_ingestion.py:684-726`). */
  def consensusSummary(tickers: Seq[String], start: String, end: String): DataFrame
  /** IBES detail recommendation history (`wrds_ingestion.py:808-843`). */
  def ratingsDetail(tickers: Seq[String], start: String, end: String): DataFrame
  /** §2.12: reduced-column fundamentals retry (`wrds_ingestion.py:505-513`)
    * — the core set the reference falls back to when the full request
    * names columns the warehouse lacks. Default: project the core columns
    * out of [[fundamentals]] (sources that materialize whatever exists);
    * remote implementations override with a genuinely smaller query.
    */
  def fundamentalsCore(gvkeys: Seq[String], start: String, end: String): DataFrame =
    fundamentals(gvkeys, start, end)
      .select("gvkey", "datadate", "revt", "ni", "at", "dltt", "oancf")
  /** §2.12: ordered candidate sources for the detail recommendation
    * history (`wrds_ingestion.py:810-840` probes tr_ibes.recddet then the
    * det_rec variants). Each thunk must THROW if its table is absent;
    * [[graft.Ingest]] takes the first that reads. Default: just
    * [[ratingsDetail]].
    */
  def ratingsDetailLadder(tickers: Seq[String], start: String, end: String)
      : Seq[() => DataFrame] =
    Seq(() => ratingsDetail(tickers, start, end))
  /** `ff_all.fivefactors_daily` (+`factors_daily` umd) (`wrds_ingestion.py:895-926`). */
  def ffFactors(start: String, end: String): DataFrame
  /** `crsp.msf` monthly prices (`wrds_ingestion.py:192-207`). */
  def pricesMonthly(permnos: Seq[Long], start: String, end: String): DataFrame
  /** `crsp.msedist` dividends (`wrds_ingestion.py:210-227`). */
  def dividends(permnos: Seq[Long], start: String, end: String): DataFrame
  /** `crsp.dsp500` benchmark returns (`wrds_ingestion.py:984-1001`). */
  def benchmark(start: String, end: String): DataFrame
}

/** Live-warehouse implementation: each query is shipped verbatim over JDBC
  * so the Postgres side does the entity/date filtering, exactly like the
  * reference's `db.raw_sql` (SURVEY.md §2.1 S2). Executors stream the
  * result; nothing is materialized on the driver.
  */
class JdbcEquitySource(spark: SparkSession, url: String,
    connProps: Map[String, String]) extends EquitySource {

  private def sql(q: String): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url).option("query", q)
    connProps.foldLeft(reader)((r, kv) => r.option(kv._1, kv._2)).load()
  }

  /** F6: SQL literal escaping for IN-lists (`wrds_ingestion.py:24-28`). */
  private def inList(vs: Seq[Any]): String =
    vs.map(_.toString.replace("'", "''")).mkString("','")

  def universe(start: String, end: String): DataFrame = sql(
    s"""select permno, start as start_date, ending as end_date
       |from crsp.dsp500list
       |where start <= '$end' and ending >= '$start'""".stripMargin)

  def nameRecords(permnos: Seq[Long]): DataFrame = sql(
    s"""select distinct permno as asset_id, ticker,
       |  namedt as first_date, nameendt as last_date
       |from crsp.dsenames where permno in ('${inList(permnos)}')""".stripMargin)

  def ipoDates(permnos: Seq[Long]): DataFrame = sql(
    s"""select distinct l.lpermno as asset_id, g.ipodate
       |from crsp.ccmxpf_linktable l
       |join comp_global_daily.g_company g on l.gvkey = g.gvkey
       |where l.lpermno in ('${inList(permnos)}')
       |  and l.linktype in ('LU','LC') and l.linkprim in ('P','C')""".stripMargin)

  def pricesDaily(permnos: Seq[Long], start: String, end: String): DataFrame = sql(
    s"""select d.date, d.permno, d.openprc as open, d.askhi as high,
       |  d.bidlo as low, d.prc as close, d.cfacpr, d.ret, d.shrout,
       |  d.vol as volume
       |from crsp.dsf d
       |where d.permno in ('${inList(permnos)}')
       |  and d.date between '$start' and '$end'""".stripMargin)

  def delistEvents(permnos: Seq[Long], start: String, end: String): DataFrame = sql(
    s"""select permno as asset_id, delistingdt as date, delret
       |from crsp.StkDelists
       |where permno in ('${inList(permnos)}')
       |  and delistingdt between '$start' and '$end'""".stripMargin)

  def ccmLinks(permnos: Seq[Long], end: String): DataFrame = sql(
    s"""select gvkey, lpermno as permno, linkdt, linkenddt
       |from crsp.ccmxpf_linktable
       |where lpermno in ('${inList(permnos)}')
       |  and linktype in ('LU','LC') and linkprim in ('P','C')
       |  and (linkdt <= '$end' or linkdt is null)""".stripMargin)

  def fundamentals(gvkeys: Seq[String], start: String, end: String): DataFrame = sql(
    s"""select gvkey, datadate, revt, sale, ni, at, ceq, dltt, pstk,
       |  oancf, capx, xrd
       |from comp.funda
       |where gvkey in ('${inList(gvkeys)}')
       |  and indfmt='INDL' and datafmt='STD' and popsrc='D' and consol='C'
       |  and datadate between '$start' and '$end'""".stripMargin)

  def ibesIds(end: String): DataFrame = sql(
    // typed NULL: a bare `null` resolves to text over JDBC and would
    // silently coerce the whole idxref end_date pipeline to strings
    s"""select ticker, cusip, cname, sdates as start_date,
       |  cast(null as date) as end_date
       |from tr_ibes.id where sdates <= '$end'""".stripMargin)

  def crspCusipNames(permnos: Seq[Long], start: String, end: String): DataFrame = sql(
    s"""select permno as asset_id, ncusip, namedt as start_date,
       |  nameendt as end_date
       |from crsp.dsenames
       |where permno in ('${inList(permnos)}') and ncusip is not null
       |  and namedt <= '$end' and (nameendt is null or nameendt >= '$start')""".stripMargin)

  def consensusSummary(tickers: Seq[String], start: String, end: String): DataFrame = sql(
    s"""select statpers, ticker, oftic, cusip, cname, buypct, holdpct,
       |  sellpct, meanrec, medrec, stdev, numup, numdown, numrec, usfirm
       |from tr_ibes.recdsum
       |where ticker in ('${inList(tickers)}')
       |  and statpers between '$start' and '$end'""".stripMargin)

  def ratingsDetail(tickers: Seq[String], start: String, end: String): DataFrame = sql(
    s"""select * from tr_ibes.recddet
       |where ticker in ('${inList(tickers)}')
       |  and anndats between '$start' and '$end'""".stripMargin)

  /** Reduced core-column retry, verbatim from `wrds_ingestion.py:505-513`. */
  override def fundamentalsCore(gvkeys: Seq[String], start: String,
      end: String): DataFrame = sql(
    s"""select gvkey, datadate, revt, ni, at, dltt, oancf
       |from comp.funda
       |where gvkey in ('${inList(gvkeys)}')
       |  and indfmt='INDL' and datafmt='STD' and popsrc='D' and consol='C'
       |  and datadate between '$start' and '$end'""".stripMargin)

  /** The reference's detail-table probe order (`wrds_ingestion.py:810-821`):
    * tr_ibes.recddet (anndats-dated), then det_rec (statpers-dated) in
    * tr_ibes, ibes, ibesus. Each candidate ships the same pushdown SQL
    * with the table's own date field.
    */
  override def ratingsDetailLadder(tickers: Seq[String], start: String,
      end: String): Seq[() => DataFrame] = {
    val candidates = Seq(
      ("tr_ibes.recddet", "anndats"),
      ("tr_ibes.det_rec", "statpers"),
      ("ibes.det_rec", "statpers"),
      ("ibesus.det_rec", "statpers"))
    candidates.map { case (table, dateField) =>
      () => sql(
        s"""select * from $table
           |where ticker in ('${inList(tickers)}')
           |  and $dateField between '$start' and '$end'""".stripMargin)
    }
  }

  def ffFactors(start: String, end: String): DataFrame = sql(
    s"""select f.date, f.mktrf, f.smb, f.hml, f.rmw, f.cma, f.rf, m.umd
       |from ff_all.fivefactors_daily f
       |left join ff_all.factors_daily m on f.date = m.date
       |where f.date between '$start' and '$end'""".stripMargin)

  def pricesMonthly(permnos: Seq[Long], start: String, end: String): DataFrame = sql(
    s"""select m.date, m.permno, m.prc as close, m.ret, m.vol as volume,
       |  m.shrout
       |from crsp.msf m
       |where m.permno in ('${inList(permnos)}')
       |  and m.date between '$start' and '$end'""".stripMargin)

  def dividends(permnos: Seq[Long], start: String, end: String): DataFrame = sql(
    s"""select permno as asset_id, distcd, divamt, facpr, facshr,
       |  paydt as date
       |from crsp.msedist
       |where permno in ('${inList(permnos)}')
       |  and paydt between '$start' and '$end'""".stripMargin)

  def benchmark(start: String, end: String): DataFrame = sql(
    s"""select date, vwretd as ret from crsp.dsp500
       |where date between '$start' and '$end'""".stripMargin)
}

/** Parquet-snapshot implementation for the zero-egress environment: each
  * method reads `dir/<name>.parquet` and applies the same filters the SQL
  * would have pushed, which Catalyst in turn pushes into the parquet scan.
  * Missing snapshots degrade to typed empty frames (§2.12).
  */
class SnapshotEquitySource(spark: SparkSession, dir: String) extends EquitySource {

  private def read(name: String, fallbackCols: Seq[(String, String)]): DataFrame =
    scala.util.Try(spark.read.parquet(s"$dir/$name.parquet")).getOrElse {
      val schema = org.apache.spark.sql.types.StructType(fallbackCols.map {
        case (n, t) => org.apache.spark.sql.types.StructField(
          n, org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(t))
      })
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  private def between(df: DataFrame, c: String, s: String, e: String) =
    df.filter(col(c).between(lit(s).cast("timestamp"), lit(e).cast("timestamp")))

  def universe(start: String, end: String): DataFrame =
    read("universe", Seq("permno" -> "bigint", "start_date" -> "timestamp",
      "end_date" -> "timestamp"))
      .filter(col("start_date") <= lit(end).cast("timestamp") &&
        col("end_date") >= lit(start).cast("timestamp"))

  def nameRecords(permnos: Seq[Long]): DataFrame =
    read("name_records", Seq("asset_id" -> "bigint", "ticker" -> "string",
      "first_date" -> "timestamp", "last_date" -> "timestamp"))
      .filter(col("asset_id").isin(permnos: _*)).distinct()

  def ipoDates(permnos: Seq[Long]): DataFrame =
    read("ipo_dates", Seq("asset_id" -> "bigint", "ipodate" -> "timestamp"))
      .filter(col("asset_id").isin(permnos: _*)).distinct()

  def pricesDaily(permnos: Seq[Long], start: String, end: String): DataFrame =
    between(read("prices_daily_raw", Seq("date" -> "timestamp",
      "permno" -> "bigint", "open" -> "double", "high" -> "double",
      "low" -> "double", "close" -> "double", "cfacpr" -> "double",
      "ret" -> "double", "shrout" -> "bigint", "volume" -> "bigint"))
      .filter(col("permno").isin(permnos: _*)), "date", start, end)

  def delistEvents(permnos: Seq[Long], start: String, end: String): DataFrame =
    between(read("delists", Seq("asset_id" -> "bigint", "date" -> "timestamp",
      "delret" -> "double"))
      .filter(col("asset_id").isin(permnos: _*)), "date", start, end)

  def ccmLinks(permnos: Seq[Long], end: String): DataFrame =
    read("ccm_links", Seq("gvkey" -> "string", "permno" -> "bigint",
      "linkdt" -> "timestamp", "linkenddt" -> "timestamp"))
      .filter(col("permno").isin(permnos: _*))
      .filter(col("linkdt").isNull || col("linkdt") <= lit(end).cast("timestamp"))

  def fundamentals(gvkeys: Seq[String], start: String, end: String): DataFrame =
    between(read("funda", Seq("gvkey" -> "string", "datadate" -> "timestamp",
      "revt" -> "double", "sale" -> "double", "ni" -> "double",
      "at" -> "double", "ceq" -> "double", "dltt" -> "double",
      "pstk" -> "double", "oancf" -> "double", "capx" -> "double",
      "xrd" -> "double"))
      .filter(col("gvkey").isin(gvkeys: _*)), "datadate", start, end)

  def ibesIds(end: String): DataFrame =
    read("ibes_ids", Seq("ticker" -> "string", "cusip" -> "string",
      "cname" -> "string", "start_date" -> "timestamp",
      "end_date" -> "timestamp"))
      .filter(col("start_date") <= lit(end).cast("timestamp"))

  def crspCusipNames(permnos: Seq[Long], start: String, end: String): DataFrame =
    read("crsp_cusip_names", Seq("asset_id" -> "bigint", "ncusip" -> "string",
      "start_date" -> "timestamp", "end_date" -> "timestamp"))
      .filter(col("asset_id").isin(permnos: _*) && col("ncusip").isNotNull)
      .filter(col("start_date") <= lit(end).cast("timestamp") &&
        (col("end_date").isNull || col("end_date") >= lit(start).cast("timestamp")))

  def consensusSummary(tickers: Seq[String], start: String, end: String): DataFrame =
    between(read("recdsum", Seq("statpers" -> "timestamp", "ticker" -> "string",
      "oftic" -> "string", "cusip" -> "string", "cname" -> "string",
      "buypct" -> "double", "holdpct" -> "double", "sellpct" -> "double",
      "meanrec" -> "double", "medrec" -> "double", "stdev" -> "double",
      "numup" -> "bigint", "numdown" -> "bigint", "numrec" -> "bigint",
      "usfirm" -> "bigint"))
      .filter(col("ticker").isin(tickers: _*)), "statpers", start, end)

  def ratingsDetail(tickers: Seq[String], start: String, end: String): DataFrame =
    between(read("recddet", Seq("ticker" -> "string", "anndats" -> "timestamp",
      "analys" -> "bigint", "ireccd" -> "double", "etext" -> "string",
      "itext" -> "string", "statpers" -> "timestamp"))
      .filter(col("ticker").isin(tickers: _*)), "anndats", start, end)

  /** Snapshot twin of the reference's detail-table probes: a MISSING
    * snapshot file throws (≈ table absent → next rung), unlike the lenient
    * [[ratingsDetail]], which degrades to a typed empty frame.
    */
  override def ratingsDetailLadder(tickers: Seq[String], start: String,
      end: String): Seq[() => DataFrame] = {
    def strict(name: String, dateField: String): DataFrame =
      between(spark.read.parquet(s"$dir/$name.parquet")
        .filter(col("ticker").isin(tickers: _*)), dateField, start, end)
    Seq(
      () => strict("recddet", "anndats"),
      () => strict("det_rec", "statpers"))
  }

  def ffFactors(start: String, end: String): DataFrame =
    between(read("ff_factors", Seq("date" -> "timestamp", "mktrf" -> "double",
      "smb" -> "double", "hml" -> "double", "rmw" -> "double",
      "cma" -> "double", "rf" -> "double", "umd" -> "double")),
      "date", start, end)

  def pricesMonthly(permnos: Seq[Long], start: String, end: String): DataFrame =
    between(read("prices_monthly_raw", Seq("date" -> "timestamp",
      "permno" -> "bigint", "close" -> "double", "ret" -> "double",
      "volume" -> "bigint", "shrout" -> "bigint"))
      .filter(col("permno").isin(permnos: _*)), "date", start, end)

  def dividends(permnos: Seq[Long], start: String, end: String): DataFrame =
    between(read("dividends_raw", Seq("asset_id" -> "bigint",
      "distcd" -> "bigint", "divamt" -> "double", "facpr" -> "double",
      "facshr" -> "double", "date" -> "timestamp"))
      .filter(col("asset_id").isin(permnos: _*)), "date", start, end)

  def benchmark(start: String, end: String): DataFrame =
    between(read("benchmark_raw", Seq("date" -> "timestamp", "ret" -> "double")),
      "date", start, end)
}
