package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.DataFrame

import graft.sources.{JdbcEquitySource, StubMacroSource}

/** The JDBC seam against a LIVE SQL engine (VERDICT r3 item 4): an
  * embedded Derby database (in /opt/spark/jars, so zero-egress) is loaded
  * with miniature WRDS-shaped tables and [[JdbcEquitySource]] drives the
  * full 17-step [[Ingest.run]] through it — proving the verbatim query
  * text (`wrds_ingestion.py:108-227,481-513,567-598,684-726,808-843,
  * 895-926,984-1001`), the IN-list quote escaping
  * (`wrds_ingestion.py:24-28` twin at `EquitySource.scala:84-85` — an
  * apostrophe ticker must round-trip), the Spark JDBC reader options, and
  * the date typing end-to-end.
  *
  * Postgres-vs-Derby dialect gaps, handled WITHOUT touching the query
  * text:
  *   - Postgres folds unquoted identifiers to lowercase, Derby to
  *     UPPERCASE; [[DerbyEquitySource]] lowercases result column names —
  *     a pure presentation shim at the test boundary.
  *   - Derby reserves `AT`, so the `comp.funda` queries (which select the
  *     `at` column Postgres accepts) cannot parse — the fundamentals
  *     ladder therefore exercises its §2.12 degraded path against a live
  *     engine: every rung throws SQLSyntaxError and the run continues
  *     with a schema-stable empty, exactly the contract
  *     (`wrds_ingestion.py:501-513`).
  *   - Derby reserves `OPEN` and `CLOSE`, the alias targets of the two
  *     price queries; those two methods instead read the SAME tables raw
  *     through the SAME Spark JDBC reader (`dbtable` instead of `query`)
  *     and apply the identical projection/filter Spark-side — the query
  *     TEXT is unprovable on Derby for them, the JDBC data path is live.
  *
  * permno/gvkey are VARCHAR in the fixture: the reference's `_sql_list`
  * renders every IN-list quoted (`'1','2'`), which Postgres implicitly
  * coerces against numeric columns but Derby will not — string-keyed
  * columns keep the comparison well-typed on both engines while
  * exercising the identical query text.
  */
class JdbcIngestSpec extends SparkSpec {

  private def lc(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase): _*)

  private class DerbyEquitySource(url: String)
      extends JdbcEquitySource(spark, url,
        Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")) {
    import org.apache.spark.sql.functions.{col, lit}
    override def universe(s: String, e: String) = lc(super.universe(s, e))
    override def nameRecords(p: Seq[Long]) = lc(super.nameRecords(p))
    override def ipoDates(p: Seq[Long]) = lc(super.ipoDates(p))
    override def delistEvents(p: Seq[Long], s: String, e: String) =
      lc(super.delistEvents(p, s, e))
    override def ccmLinks(p: Seq[Long], e: String) = lc(super.ccmLinks(p, e))
    override def fundamentals(g: Seq[String], s: String, e: String) =
      lc(super.fundamentals(g, s, e))
    override def fundamentalsCore(g: Seq[String], s: String, e: String) =
      lc(super.fundamentalsCore(g, s, e))
    override def ibesIds(e: String) = lc(super.ibesIds(e))
    override def crspCusipNames(p: Seq[Long], s: String, e: String) =
      lc(super.crspCusipNames(p, s, e))
    override def consensusSummary(t: Seq[String], s: String, e: String) =
      lc(super.consensusSummary(t, s, e))
    override def ratingsDetail(t: Seq[String], s: String, e: String) =
      lc(super.ratingsDetail(t, s, e))
    override def ratingsDetailLadder(t: Seq[String], s: String, e: String) =
      super.ratingsDetailLadder(t, s, e).map(c => () => lc(c()))
    override def ffFactors(s: String, e: String) = lc(super.ffFactors(s, e))
    override def dividends(p: Seq[Long], s: String, e: String) =
      lc(super.dividends(p, s, e))
    override def benchmark(s: String, e: String) = lc(super.benchmark(s, e))

    // `open`/`close` (the price queries' alias targets) are Derby reserved
    // words: same JDBC reader, table read raw, identical projection applied
    // Spark-side. The query TEXT for these two runs only on Postgres.
    private def table(name: String): DataFrame =
      lc(spark.read.format("jdbc").option("url", url).option("dbtable", name)
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver").load())
    private def inRange(df: DataFrame, p: Seq[Long], dateCol: String,
        s: String, e: String): DataFrame =
      df.filter(col("permno").cast("long").isin(p: _*) &&
        col(dateCol).between(lit(s).cast("date"), lit(e).cast("date")))
    override def pricesDaily(p: Seq[Long], s: String, e: String) =
      inRange(table("crsp.dsf"), p, "date", s, e)
        .select(col("date"), col("permno"), col("openprc").as("open"),
          col("askhi").as("high"), col("bidlo").as("low"),
          col("prc").as("close"), col("cfacpr"), col("ret"), col("shrout"),
          col("vol").as("volume"))
    override def pricesMonthly(p: Seq[Long], s: String, e: String) =
      inRange(table("crsp.msf"), p, "date", s, e)
        .select(col("date"), col("permno"), col("prc").as("close"),
          col("ret"), col("vol").as("volume"), col("shrout"))
  }

  /** Miniature warehouse: the IngestSpec synthetic fixture re-expressed
    * as SQL rows, with an APOSTROPHE in the IBES ticker ("A'AI") so the
    * recdsum/recddet IN-lists only match if the escaping twin doubles the
    * quote exactly like `wrds_ingestion.py:24-28`.
    */
  private lazy val url: String = {
    val u = "jdbc:derby:memory:graftwrds"
    val conn = DriverManager.getConnection(u + ";create=true")
    val st = conn.createStatement()
    def run(sqls: String*): Unit = sqls.foreach(st.execute)
    run(
      "CREATE SCHEMA crsp", "CREATE SCHEMA tr_ibes", "CREATE SCHEMA ff_all",
      "CREATE SCHEMA comp_global_daily",
      """CREATE TABLE crsp.dsp500list (permno VARCHAR(10), start DATE, ending DATE)""",
      """INSERT INTO crsp.dsp500list VALUES
        |('1', DATE('2020-01-01'), DATE('2020-12-31')),
        |('2', DATE('2020-01-01'), DATE('2020-06-30'))""".stripMargin,
      """CREATE TABLE crsp.dsenames (permno VARCHAR(10), ticker VARCHAR(10),
        |namedt DATE, nameendt DATE, ncusip VARCHAR(10))""".stripMargin,
      """INSERT INTO crsp.dsenames VALUES
        |('1', 'AAA', DATE('2010-01-01'), DATE('2015-12-31'), '11111110'),
        |('1', 'AAN', DATE('2016-01-01'), DATE('2020-12-31'), '11111110'),
        |('2', 'BBB', DATE('2010-01-01'), DATE('2020-06-30'), '22222220')""".stripMargin,
      """CREATE TABLE crsp.ccmxpf_linktable (gvkey VARCHAR(10),
        |lpermno VARCHAR(10), linktype VARCHAR(4), linkprim VARCHAR(4),
        |linkdt DATE, linkenddt DATE)""".stripMargin,
      """INSERT INTO crsp.ccmxpf_linktable VALUES
        |('G1', '1', 'LU', 'P', DATE('2010-01-01'), NULL),
        |('G2', '2', 'LC', 'C', DATE('2010-01-01'), DATE('2020-12-31'))""".stripMargin,
      """CREATE TABLE comp_global_daily.g_company (gvkey VARCHAR(10), ipodate DATE)""",
      """INSERT INTO comp_global_daily.g_company VALUES ('G1', DATE('2009-05-01'))""",
      """CREATE TABLE crsp.dsf (date DATE, permno VARCHAR(10), openprc DOUBLE,
        |askhi DOUBLE, bidlo DOUBLE, prc DOUBLE, cfacpr DOUBLE, ret DOUBLE,
        |shrout BIGINT, vol BIGINT)""".stripMargin,
      """INSERT INTO crsp.dsf VALUES
        |(DATE('2020-01-02'), '1', 10.0, 11.0, 9.0, 10.0, 2.0, 0.01, 100, 1000),
        |(DATE('2020-01-03'), '1', 10.5, 11.5, 9.5, 10.5, 2.0, 0.05, 100, 1100),
        |(DATE('2020-01-02'), '2', 20.0, 21.0, 19.0, 20.0, 1.0, 0.02, 200, 2000),
        |(DATE('2020-01-03'), '2', 20.4, 21.4, 19.4, 20.4, 1.0, 0.02, 200, 2100)""".stripMargin,
      """CREATE TABLE crsp.StkDelists (permno VARCHAR(10), delistingdt DATE,
        |delret DOUBLE)""".stripMargin,
      """INSERT INTO crsp.StkDelists VALUES ('2', DATE('2020-01-03'), -0.5)""",
      // comp.funda deliberately NOT created: Derby reserves `at`, so the
      // verbatim funda queries cannot parse on this engine regardless —
      // the ladder must degrade (asserted below).
      """CREATE TABLE tr_ibes.id (ticker VARCHAR(10), cusip VARCHAR(10),
        |cname VARCHAR(40), sdates DATE)""".stripMargin,
      """INSERT INTO tr_ibes.id VALUES
        |('A''AI', '11111110', 'Alpha O''Corp', DATE('2015-01-01')),
        |('BBBI', '22222220', 'Beta Corp', DATE('2015-01-01'))""".stripMargin,
      """CREATE TABLE tr_ibes.recdsum (statpers DATE, ticker VARCHAR(10),
        |oftic VARCHAR(10), cusip VARCHAR(10), cname VARCHAR(40),
        |buypct DOUBLE, holdpct DOUBLE, sellpct DOUBLE, meanrec DOUBLE,
        |medrec DOUBLE, stdev DOUBLE, numup BIGINT, numdown BIGINT,
        |numrec BIGINT, usfirm BIGINT)""".stripMargin,
      """INSERT INTO tr_ibes.recdsum VALUES
        |(DATE('2020-01-15'), 'A''AI', 'AAA', '11111110', 'Alpha O''Corp',
        | 60.0, 30.0, 10.0, 1.8, 2.0, 0.4, 2, 1, 10, 1),
        |(DATE('2020-01-15'), 'A''AI', 'AAA', '11111110', 'Alpha O''Corp',
        | NULL, NULL, NULL, NULL, 2.0, 0.4, 2, 1, 10, 1)""".stripMargin,
      """CREATE TABLE tr_ibes.recddet (ticker VARCHAR(10), anndats DATE,
        |analys BIGINT, ireccd DOUBLE, etext VARCHAR(10), itext VARCHAR(20),
        |statpers DATE)""".stripMargin,
      """INSERT INTO tr_ibes.recddet VALUES
        |('A''AI', DATE('2020-02-01'), 77, 1.0, 'up', 'Strong Buy', DATE('2020-02-01')),
        |('BBBI', DATE('2020-03-01'), 88, 3.0, 'down', 'Hold', DATE('2020-03-01'))""".stripMargin,
      """CREATE TABLE ff_all.fivefactors_daily (date DATE, mktrf DOUBLE,
        |smb DOUBLE, hml DOUBLE, rmw DOUBLE, cma DOUBLE, rf DOUBLE)""".stripMargin,
      """INSERT INTO ff_all.fivefactors_daily VALUES
        |(DATE('2020-01-02'), 1.0, 0.5, -0.2, 0.1, 0.05, 0.01),
        |(DATE('2020-01-03'), -0.5, NULL, 0.3, NULL, NULL, 0.01)""".stripMargin,
      """CREATE TABLE ff_all.factors_daily (date DATE, umd DOUBLE)""",
      """INSERT INTO ff_all.factors_daily VALUES
        |(DATE('2020-01-02'), 2.0), (DATE('2020-01-03'), -1.0)""".stripMargin,
      """CREATE TABLE crsp.msf (date DATE, permno VARCHAR(10), prc DOUBLE,
        |ret DOUBLE, vol BIGINT, shrout BIGINT)""".stripMargin,
      """INSERT INTO crsp.msf VALUES
        |(DATE('2020-01-31'), '1', 11.0, 0.10, 30000, 100),
        |(DATE('2020-01-31'), '2', 19.0, -0.05, 40000, 200)""".stripMargin,
      """CREATE TABLE crsp.msedist (permno VARCHAR(10), distcd BIGINT,
        |divamt DOUBLE, facpr DOUBLE, facshr DOUBLE, paydt DATE)""".stripMargin,
      """INSERT INTO crsp.msedist VALUES
        |('1', 1232, 0.5, NULL, NULL, DATE('2020-01-31')),
        |('1', 1232, 0.25, NULL, NULL, DATE('2020-01-31'))""".stripMargin,
      """CREATE TABLE crsp.dsp500 (date DATE, vwretd DOUBLE)""",
      """INSERT INTO crsp.dsp500 VALUES
        |(DATE('2020-01-02'), 0.01), (DATE('2020-01-03'), -0.02)""".stripMargin)
    st.close(); conn.close()
    u
  }

  test("full ingest through JDBC against embedded Derby") {
    val root = Files.createTempDirectory("graft-ingest-jdbc").toString
    val result = Ingest.run(spark, new DerbyEquitySource(url),
      new StubMacroSource(spark), root,
      start = "2020-01-01", end = "2020-12-31")
    assert(result.steps.size == 17)

    def read(p: String) = spark.read.parquet(s"$root/$p")

    // assets master through the live dsenames/ccm/g_company queries:
    // dedup kept the latest name record, IPO enrichment joined
    val am = read("data_meta/assets_master.parquet").orderBy("asset_id").collect()
    assert(am.map(_.getAs[String]("ticker")).toSeq == Seq("AAN", "BBB"))
    assert(String.valueOf(am(0).getAs[Any]("ipodate")).startsWith("2009-05-01"))

    // prices: permno IN-list + date BETWEEN executed remotely; F1 adj_close
    val px = read("data_processed/prices_daily.parquet")
      .filter("asset_id = '1' AND date = '2020-01-02'").collect().head
    assert(px.getAs[Double]("adj_close") == 20.0)
    assert(px.getAs[String]("ticker") == "AAN")

    // returns: delist row came through crsp.StkDelists and compounded
    val r2 = read("data_processed/returns_daily.parquet")
      .filter("asset_id = '2' AND date = '2020-01-03'").collect().head
    assert(math.abs(r2.getAs[Double]("ret_1d") - (1.02 * 0.5 - 1)) < 1e-12)

    // consensus: the IN-list carried ticker A'AI — this row only exists
    // if the escaping twin doubled the quote (wrds_ingestion.py:24-28)
    val c = read("data_processed/analyst_consensus.parquet").collect()
    assert(c.length == 1)
    assert(c.head.getAs[Double]("mean_rating") == 1.8)
    assert(String.valueOf(c.head.getAs[Any]("asset_id")) == "1")
    assert(c.head.getAs[String]("company_name") == "Alpha O'Corp")

    // ratings detail: ladder rung 1 (tr_ibes.recddet) read live, with the
    // escaped ticker again in its IN-list
    val rh = read("data_processed/analyst_ratings_history.parquet")
      .orderBy("date").collect()
    assert(rh.length == 2)
    assert(rh.head.getAs[String]("rating_text") == "Strong Buy")
    assert(rh.head.getAs[Long]("analyst_id") == 77L)

    // factors: the ff_all LEFT JOIN ran remotely; MOM present from umd
    val fac = read("data_processed/style_factor_returns.parquet")
    assert(fac.filter("factor_name = 'MOM'").count() == 2)

    // benchmark levels from crsp.dsp500
    val b = read("data_processed/benchmarks.parquet").orderBy("date").collect()
    assert(math.abs(b(0).getAs[Double]("level") - 101.0) < 1e-9)

    // dividends: same-day msedist rows summed, yield from msf close
    val d = read("data_processed/dividends_monthly.parquet").collect().head
    assert(d.getAs[Double]("divamt") == 0.75)
    assert(math.abs(d.getAs[Double]("dividend_yield") - 0.75 / 11.0) < 1e-12)

    // fundamentals: Derby reserves `at`, so every funda ladder rung threw
    // SQLSyntaxError — the §2.12 contract is a schema-stable EMPTY frame
    // and a completed run, not an abort
    val f = read("data_processed/fundamentals_quarterly.parquet")
    assert(f.count() == 0)
    assert(f.columns.contains("asset_id"))
  }
}
