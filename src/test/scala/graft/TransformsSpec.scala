package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Operator-level tests for the ingestion transforms the reference never
  * unit-tests (SURVEY.md §5 step 2): delist compounding, interval joins,
  * deterministic dedups, melt, cumprod, dividends.
  */
class TransformsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  import scala.jdk.CollectionConverters._
  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(rows.asJava, schema)

  private val retSchema = StructType(Seq(
    StructField("asset_id", LongType), StructField("date", TimestampType),
    StructField("ticker", StringType), StructField("ret_1d", DoubleType)))
  private val dlSchema = StructType(Seq(
    StructField("asset_id", LongType), StructField("date", TimestampType),
    StructField("dlret", DoubleType)))

  test("delist compounding: (1+r)(1+d)-1, missing dlret = identity (F2)") {
    val rets = df(retSchema,
      Row(1L, ts("2020-01-02"), "AAA", 0.10),
      Row(2L, ts("2020-01-02"), "BBB", 0.05))
    val dl = df(dlSchema, Row(1L, ts("2020-01-02"), -0.5))
    val out = Transforms.applyDelistReturns(rets, dl)
      .orderBy("asset_id").collect()
    assert(math.abs(out(0).getDouble(3) - ((1.10 * 0.5) - 1)) < 1e-12)
    // no delist row → (1+r)*(1+0)-1, same one-ulp drift as the reference
    assert(math.abs(out(1).getDouble(3) - 0.05) < 1e-15)
  }

  test("delist compounding tolerates delret naming and empty frames (§2.12)") {
    val rets = df(retSchema, Row(1L, ts("2020-01-02"), "AAA", 0.10))
    val renamed = df(
      StructType(Seq(StructField("asset_id", LongType),
        StructField("date", TimestampType), StructField("delret", DoubleType))),
      Row(1L, ts("2020-01-02"), 0.0))
    val out = Transforms.applyDelistReturns(rets, renamed).collect()
    assert(math.abs(out(0).getDouble(3) - 0.10) < 1e-12) // dlret=0 identity
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], dlSchema)
    assert(Transforms.applyDelistReturns(rets, empty).collect()
      .head.getDouble(3) == 0.10)
  }

  test("cusip normalization strips and truncates; idempotent (F5)") {
    val d = df(StructType(Seq(StructField("cusip", StringType))),
      Row("03783-31L0"), Row("ab.cd/EF-GH-12"), Row("XY"))
    val once = d.select(Transforms.normalizeCusip(col("cusip")).as("c"))
    assert(once.collect().map(_.getString(0)).toSeq ==
      Seq("0378331L", "abcdEFGH", "XY"))
    val twice = once.select(Transforms.normalizeCusip(col("c")).as("c"))
    assert(twice.collect().map(_.getString(0)).toSeq ==
      once.collect().map(_.getString(0)).toSeq)
  }

  test("ibes-crsp mapping intersects validity intervals (J5)") {
    val ibes = df(
      StructType(Seq(StructField("ticker", StringType), StructField("cname", StringType),
        StructField("cusip", StringType), StructField("start_date", TimestampType),
        StructField("end_date", TimestampType))),
      Row("AAPL", "Apple", "03783310-", ts("2019-01-01"), null),
      Row("MSFT", "Microsoft", "59491810", ts("2000-01-01"), ts("2001-01-01")))
    val crsp = df(
      StructType(Seq(StructField("asset_id", LongType), StructField("ncusip", StringType),
        StructField("start_date", TimestampType), StructField("end_date", TimestampType))),
      Row(14593L, "03783310", ts("2020-06-01"), null),
      Row(10107L, "59491810", ts("2000-06-01"), ts("2000-12-01")))
    val out = Transforms.ibesCrspMapping(ibes, crsp, "2020-01-01", "2024-12-31")
      .collect()
    // AAPL: [max(2019-01-01, 2020-06-01), min(open, open)] = [2020-06-01, OpenEnd]
    assert(out.length == 1)
    assert(out.head.getAs[Long]("asset_id") == 14593L)
    assert(out.head.getAs[Timestamp]("start_date") == ts("2020-06-01"))
    assert(out.head.getAs[Timestamp]("end_date") == Transforms.OpenEnd)
    // MSFT interval [2000-06-01, 2000-12-01] is outside [2020, 2024] → dropped
  }

  test("fundamentals link join applies interval containment + renames (J3/P7)") {
    val funda = df(
      StructType(Seq(StructField("gvkey", StringType), StructField("datadate", TimestampType),
        StructField("ni", DoubleType), StructField("at", DoubleType))),
      Row("001", ts("2020-03-31"), 10.0, 500.0),
      Row("001", ts("2022-03-31"), 11.0, 510.0),
      Row("002", ts("2020-03-31"), 20.0, 600.0))
    val links = df(
      StructType(Seq(StructField("gvkey", StringType), StructField("permno", LongType),
        StructField("linkdt", TimestampType), StructField("linkenddt", TimestampType))),
      Row("001", 111L, ts("2019-01-01"), ts("2021-01-01")),
      Row("002", 222L, ts("2019-01-01"), null)) // open-ended link
    val out = Transforms.linkFundamentals(funda, links)
    assert(out.columns.take(2).toSeq == Seq("report_date", "asset_id"))
    assert(out.columns.contains("net_income") && out.columns.contains("total_assets"))
    assert(out.columns.contains("revenue")) // missing raw col injected as null
    val rows = out.orderBy("asset_id").collect()
    assert(rows.map(_.getAs[Long]("asset_id")).toSeq == Seq(111L, 222L))
    // 2022 row for gvkey 001 is outside the link window → dropped
  }

  test("dedupe assets master: latest-name ticker, min/max dates (A2/W3)") {
    val d = df(
      StructType(Seq(StructField("asset_id", LongType), StructField("ticker", StringType),
        StructField("first_date", TimestampType), StructField("last_date", TimestampType),
        StructField("ipodate", TimestampType))),
      Row(1L, "OLD", ts("2000-01-01"), ts("2010-01-01"), null),
      Row(1L, "NEW", ts("2010-01-02"), ts("2020-01-01"), ts("1999-06-01")),
      Row(1L, null, ts("1995-01-01"), null, ts("1999-01-01")),
      Row(2L, "SOLO", ts("2005-01-01"), ts("2006-01-01"), null))
    val out = Transforms.dedupeAssetsMaster(d).orderBy("asset_id").collect()
    assert(out.length == 2)
    val a = out(0)
    assert(a.getAs[String]("ticker") == "NEW") // greatest last_date wins
    assert(a.getAs[Timestamp]("first_date") == ts("1995-01-01"))
    assert(a.getAs[Timestamp]("last_date") == ts("2020-01-01"))
    assert(a.getAs[Timestamp]("ipodate") == ts("1999-01-01"))
  }

  test("first-non-null-by is order-deterministic under shuffle (A1/A3)") {
    val d = df(
      StructType(Seq(StructField("date", TimestampType), StructField("asset_id", LongType),
        StructField("m", DoubleType), StructField("ord", LongType))),
      Row(ts("2020-01-02"), 1L, null, 1L),
      Row(ts("2020-01-02"), 1L, 3.5, 2L),
      Row(ts("2020-01-02"), 1L, 9.9, 3L)).repartition(4)
    val out = Transforms.firstNonNullBy(d, Seq("date", "asset_id"), Seq("m"), "ord")
    assert(out.collect().head.getAs[Double]("m") == 3.5)
  }

  test("clean dividends: per-day sum, daily-close preference, guarded yield (A5/J9/F4)") {
    val divs = df(
      StructType(Seq(StructField("asset_id", LongType), StructField("date", TimestampType),
        StructField("divamt", DoubleType), StructField("distcd", LongType),
        StructField("facpr", DoubleType), StructField("facshr", DoubleType),
        StructField("close", DoubleType), StructField("ord", LongType))),
      Row(1L, ts("2020-01-02"), 0.5, 1232L, null, null, 90.0, 1L),
      Row(1L, ts("2020-01-02"), 0.25, null, 0.1, null, null, 2L),
      Row(2L, ts("2020-01-02"), null, 1232L, null, null, null, 1L))
    val prices = df(
      StructType(Seq(StructField("asset_id", LongType), StructField("date", TimestampType),
        StructField("close", DoubleType))),
      Row(1L, ts("2020-01-02"), 100.0))
    val out = Transforms.cleanDividends(divs, prices, "ord")
      .orderBy("asset_id").collect()
    val a = out(0)
    assert(a.getAs[Double]("divamt") == 0.75)
    assert(a.getAs[Double]("close") == 100.0) // daily preferred over 90.0
    assert(math.abs(a.getAs[Double]("dividend_yield") - 0.0075) < 1e-12)
    val b = out(1)
    assert(b.getAs[Double]("divamt") == 0.0) // pandas sum-of-nulls == 0
    assert(b.isNullAt(b.fieldIndex("dividend_yield"))) // null close → null yield
  }

  test("factors wide→long scales once and drops nulls (U2/F3)") {
    val ff = df(
      StructType(Seq(StructField("date", TimestampType), StructField("mktrf", DoubleType),
        StructField("smb", DoubleType), StructField("umd", DoubleType))),
      Row(ts("2020-01-02"), 1.0, null, 2.0))
    val out = Transforms.factorsWideToLong(ff).orderBy("factor_name").collect()
    assert(out.map(r => (r.getString(1), r.getDouble(2))).toSeq ==
      Seq(("MKT", 0.01), ("MOM", 0.02))) // MOM scaled once (ref bug fixed)
  }

  test("benchmark level is 100 * cumprod(1+ret) (W1)") {
    val bench = df(
      StructType(Seq(StructField("date", TimestampType), StructField("ret", DoubleType))),
      Row(ts("2020-01-02"), 0.01), Row(ts("2020-01-03"), -0.02),
      Row(ts("2020-01-04"), -1.0), Row(ts("2020-01-05"), 0.5))
    val out = Transforms.benchmarkLevel(bench).orderBy("date").collect()
      .map(_.getAs[Double]("level"))
    assert(math.abs(out(0) - 101.0) < 1e-9)
    assert(math.abs(out(1) - 101.0 * 0.98) < 1e-9)
    assert(out(2) == 0.0) // -100% return: exact zero (log-exp trick would NaN)
    assert(out(3) == 0.0)
  }

  test("universe daily expands intervals over the calendar (J11/S6)") {
    val cal = Transforms.tradingCalendar(spark, "2020-01-01", "2020-01-10")
    val uni = df(
      StructType(Seq(StructField("permno", LongType),
        StructField("start_date", TimestampType), StructField("end_date", TimestampType))),
      Row(1L, ts("2020-01-02"), ts("2020-01-07")))
    val out = Transforms.universeDaily(uni, cal).orderBy("date").collect()
    // business days in [Jan 2, Jan 7] 2020: Thu 2, Fri 3, Mon 6, Tue 7
    assert(out.map(_.getAs[Timestamp]("date")).toSeq ==
      Seq(ts("2020-01-02"), ts("2020-01-03"), ts("2020-01-06"), ts("2020-01-07")))
    assert(out.forall(_.getAs[Boolean]("in_sp500")))
  }

  test("trading calendar is Mon-Fri only, inclusive ends (S6)") {
    val cal = Transforms.tradingCalendar(spark, "2020-01-01", "2020-01-31")
    assert(cal.count() == 23) // January 2020 has 23 weekdays
    assert(cal.filter(weekday(col("date")) >= 5).count() == 0)
  }

  test("conformTo injects missing columns and restores order (U3)") {
    val d = df(StructType(Seq(StructField("ret", DoubleType),
      StructField("date", TimestampType))), Row(0.1, ts("2020-01-02")))
    val out = Schemas.conformTo(d, Schemas.styleFactorReturns)
    assert(out.columns.toSeq == Seq("date", "factor_name", "ret"))
    val r = out.collect().head
    assert(r.isNullAt(1) && r.getDouble(2) == 0.1)
  }

  test("emptyOf returns typed empty frames for every dataset (§2.12)") {
    Schemas.all.keys.foreach { name =>
      val e = Schemas.emptyOf(spark, name)
      assert(e.count() == 0)
      assert(e.schema == Schemas.all(name))
    }
  }

  test("firstAvailable falls back through the candidate ladder (§2.12)") {
    val out = Transforms.firstAvailable(spark, Schemas.riskFree, Seq(
      () => throw new RuntimeException("source 1 down"),
      () => df(Schemas.riskFree, Row(ts("2020-01-02"), 0.0001))))
    assert(out.count() == 1)
    val none = Transforms.firstAvailable(spark, Schemas.riskFree, Seq(
      () => throw new RuntimeException("down")))
    assert(none.count() == 0 && none.schema == Schemas.riskFree)
  }

  test("asof join: latest right at-or-before left, nulls before any right (J12)") {
    val left = df(
      StructType(Seq(StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("amount", DoubleType))),
      Row(1L, ts("2020-01-05"), 10.0), // after both views -> latest (01-04)
      Row(1L, ts("2020-01-03"), 11.0), // equal ts -> inclusive match
      Row(1L, ts("2020-01-01"), 12.0), // before any view -> null
      Row(2L, ts("2020-01-05"), 13.0)) // other key, no views -> null
    val right = df(
      StructType(Seq(StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("view_ts", TimestampType), StructField("view_v", DoubleType))),
      Row(1L, ts("2020-01-03"), ts("2020-01-03"), 0.3),
      Row(1L, ts("2020-01-04"), ts("2020-01-04"), 0.4))
    val out = Transforms.asofJoin(left, right, Seq("user_id"), "ts", "ts",
        Seq("view_ts", "view_v"))
      .orderBy("user_id", "ts").collect()
    def vts(r: Row): Any = if (r.isNullAt(3)) null else r.getTimestamp(3)
    assert(vts(out(0)) == null)                     // (1, 01-01)
    assert(vts(out(1)) == ts("2020-01-03"))         // (1, 01-03) inclusive
    assert(vts(out(2)) == ts("2020-01-04"))         // (1, 01-05) latest
    assert(vts(out(3)) == null)                     // (2, 01-05) keyless
  }

  test("asof join carries whole right rows: a newer null value is not skipped") {
    val left = df(
      StructType(Seq(StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("amount", DoubleType))),
      Row(1L, ts("2020-01-05"), 10.0))
    val right = df(
      StructType(Seq(StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("view_ts", TimestampType), StructField("view_v", DoubleType))),
      Row(1L, ts("2020-01-02"), ts("2020-01-02"), 0.2),   // older, non-null
      Row(1L, ts("2020-01-04"), ts("2020-01-04"), null))  // latest, null value
    val out = Transforms.asofJoin(left, right, Seq("user_id"), "ts", "ts",
      Seq("view_ts", "view_v")).collect().head
    // the latest right ROW wins as a unit: its timestamp attaches AND its
    // null value stays null (not the older 0.2)
    assert(out.getTimestamp(3) == ts("2020-01-04"))
    assert(out.isNullAt(4))
  }
}
