package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Port of the reference handler test suite
  * (`tests/test_local_parquet_data_handler.py:15-198`): the same 2-asset ×
  * 5-day fixture, the same 8 behavioral assertions, plus the error
  * contracts the reference exercises implicitly.
  */
class LocalParquetDataHandlerSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
  private val dates = (1 to 5).map(d => ts(f"2020-01-0$d"))

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft-fixture").toString
    def write(rows: Seq[Row], schema: StructType, path: String): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
        .write.mode("overwrite").parquet(s"$dir/$path")

    write(
      Seq(Row(1L, "AAA", "Tech", "Software", "USD", ts("2020-01-01"), ts("2020-01-05")),
        Row(2L, "BBB", "Tech", "Software", "USD", ts("2020-01-01"), ts("2020-01-05"))),
      StructType(Seq(
        StructField("asset_id", LongType), StructField("ticker", StringType),
        StructField("sector", StringType), StructField("industry", StringType),
        StructField("currency", StringType),
        StructField("first_date", TimestampType), StructField("last_date", TimestampType))),
      "data_meta/assets_master.parquet")

    write(dates.map(d => Row(d, true)),
      StructType(Seq(StructField("date", TimestampType), StructField("is_trading_day", BooleanType))),
      "data_meta/trading_calendar.parquet")

    write(dates.flatMap(d => Seq(Row(d, 1L, true), Row(d, 2L, true))),
      StructType(Seq(StructField("date", TimestampType), StructField("asset_id", LongType),
        StructField("in_universe", BooleanType))),
      "data_meta/universe_sp500.parquet")

    val priceSchema = StructType(Seq(
      StructField("date", TimestampType), StructField("asset_id", LongType),
      StructField("ticker", StringType), StructField("open", DoubleType),
      StructField("high", DoubleType), StructField("low", DoubleType),
      StructField("close", DoubleType), StructField("adj_close", DoubleType),
      StructField("volume", LongType)))
    val priceRows = (0 until 10).map { i =>
      val (aid, tic) = if (i < 5) (1L, "AAA") else (2L, "BBB")
      Row(dates(i % 5), aid, tic, (10 + i).toDouble, (11 + i).toDouble,
        (9 + i).toDouble, (10 + i).toDouble, (10 + i).toDouble, 1000000L)
    }
    write(priceRows, priceSchema, "data_processed/prices_daily.parquet")

    // ret_1d = pct_change(adj_close) per ticker, first row dropped (:60-62)
    val retSchema = StructType(Seq(
      StructField("date", TimestampType), StructField("asset_id", LongType),
      StructField("ticker", StringType), StructField("ret_1d", DoubleType)))
    val retRows = (0 until 10).filter(i => i % 5 != 0).map { i =>
      val (aid, tic) = if (i < 5) (1L, "AAA") else (2L, "BBB")
      Row(dates(i % 5), aid, tic, (10.0 + i) / (9.0 + i) - 1.0)
    }
    write(retRows, retSchema, "data_processed/returns_daily.parquet")

    write(
      Seq(Row(ts("2020-03-31"), 1L, 100.0, 10.0, 500.0, 200.0, 12.0),
        Row(ts("2020-03-31"), 2L, 200.0, 20.0, 600.0, 250.0, 22.0)),
      StructType(Seq(StructField("report_date", TimestampType),
        StructField("asset_id", LongType), StructField("book_value", DoubleType),
        StructField("net_income", DoubleType), StructField("total_assets", DoubleType),
        StructField("total_debt", DoubleType), StructField("cfo", DoubleType))),
      "data_processed/fundamentals_quarterly.parquet")

    write(dates.zipWithIndex.map { case (d, i) => Row(d, "CPI", i.toDouble) },
      StructType(Seq(StructField("date", TimestampType),
        StructField("series_name", StringType), StructField("value", DoubleType))),
      "data_processed/macro_timeseries.parquet")

    write(dates.map(d => Row(d, "MKT", 0.001)),
      StructType(Seq(StructField("date", TimestampType),
        StructField("factor_name", StringType), StructField("ret", DoubleType))),
      "data_processed/style_factor_returns.parquet")

    write(dates.zipWithIndex.map { case (d, i) => Row(d, "^GSPC", (100 + i).toDouble, 0.001) },
      StructType(Seq(StructField("date", TimestampType),
        StructField("benchmark_name", StringType), StructField("level", DoubleType),
        StructField("ret", DoubleType))),
      "data_processed/benchmarks.parquet")

    write(
      Seq(Row(ts("2020-01-02"), 1L, "AAA", 1.5, 1.0, 0.2, 5L, 1.0, 2.0, 3L, 2L, 0L),
        Row(ts("2020-01-03"), 2L, "BBB", 3.2, 3.0, 0.5, 6L, 2.0, 4.0, 1L, 3L, 2L)),
      StructType(Seq(StructField("date", TimestampType), StructField("asset_id", LongType),
        StructField("ticker", StringType), StructField("mean_rating", DoubleType),
        StructField("median_rating", DoubleType), StructField("stdev_rating", DoubleType),
        StructField("num_analysts", LongType), StructField("rating_high", DoubleType),
        StructField("rating_low", DoubleType), StructField("num_buy", LongType),
        StructField("num_hold", LongType), StructField("num_sell", LongType))),
      "data_processed/analyst_consensus.parquet")

    write(
      Seq(Row(ts("2020-01-02"), 1L, "AAA", 100L, 1.0, "INIT", "Strong Buy", ts("2020-01-02")),
        Row(ts("2020-01-04"), 2L, "BBB", 200L, 3.0, "DOWN", "Hold", ts("2020-01-04"))),
      StructType(Seq(StructField("date", TimestampType), StructField("asset_id", LongType),
        StructField("ticker", StringType), StructField("analyst_id", LongType),
        StructField("rating", DoubleType), StructField("action_code", StringType),
        StructField("rating_text", StringType), StructField("statistic_date", TimestampType))),
      "data_processed/analyst_ratings_history.parquet")
    dir
  }

  private lazy val handler = new LocalParquetDataHandler(spark, root)

  private def values[T](df: DataFrame, c: String): Seq[Any] =
    df.select(c).collect().map(_.get(0)).toSeq

  test("get_prices filters tickers, dates and fields (ref :131-139)") {
    val df = handler.getPrices(Some(Seq("AAA")),
      Some("2020-01-02"), Some("2020-01-03"), Some(Seq("close", "volume")))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(values(df, "ticker").distinct == Seq("AAA"))
    assert(rows.map(_.getTimestamp(0)).min.compareTo(ts("2020-01-02")) >= 0)
    assert(df.columns.toSet == Set("date", "asset_id", "ticker", "close", "volume"))
    // field order: mandatory first, then requested (ref preserves order)
    assert(df.columns.toSeq == Seq("date", "asset_id", "ticker", "close", "volume"))
  }

  test("get_returns filters ticker and end date (ref :142-147)") {
    val df = handler.getReturns(Some(Seq("BBB")), Some("2020-01-02"), Some("2020-01-05"))
    assert(values(df, "asset_id").distinct == Seq(2L))
    assert(df.collect().map(_.getTimestamp(0)).max.compareTo(ts("2020-01-05")) <= 0)
  }

  test("get_universe snapshot (ref :150-155)") {
    val df = handler.getUniverse(Some("2020-01-03"))
    assert(df.count() == 2)
    assert(df.select("date").distinct().count() == 1)
  }

  test("get_fundamentals filters asset and keeps columns (ref :158-163)") {
    val df = handler.getFundamentals(Some(Seq("AAA")), Some("2020-01-01"), Some("2020-12-31"))
    assert(values(df, "asset_id").distinct == Seq(1L))
    assert(Set("book_value", "net_income", "total_assets", "total_debt", "cfo")
      .subsetOf(df.columns.toSet))
  }

  test("get_macro and get_style_factor_returns (ref :166-173)") {
    val macroDf = handler.getMacro(Some("2020-01-01"), Some("2020-01-03"))
    val factors = handler.getStyleFactorReturns(Some("2020-01-01"), Some("2020-01-03"))
    assert(macroDf.count() > 0 && factors.count() > 0)
    assert(values(macroDf, "series_name").distinct == Seq("CPI"))
    assert(values(factors, "factor_name").distinct == Seq("MKT"))
  }

  test("get_benchmark_returns filters name and dates (ref :176-181)") {
    val df = handler.getBenchmarkReturns("^GSPC", Some("2020-01-02"), Some("2020-01-04"))
    assert(df.count() > 0)
    assert(values(df, "benchmark_name").distinct == Seq("^GSPC"))
  }

  test("get_analyst_consensus projection contract (ref :184-190)") {
    val df = handler.getAnalystConsensus(Some(Seq("AAA")),
      Some("2020-01-01"), Some("2020-01-03"), Some(Seq("mean_rating")))
    assert(values(df, "asset_id").distinct == Seq(1L))
    assert(df.columns.toSet == Set("date", "asset_id", "ticker", "mean_rating"))
    assert(df.collect().map(_.getTimestamp(0)).min.compareTo(ts("2020-01-01")) >= 0)
  }

  test("get_analyst_ratings_history filters (ref :193-198)") {
    val df = handler.getAnalystRatingsHistory(Some(Seq("BBB")),
      Some("2020-01-03"), Some("2020-01-05"))
    assert(values(df, "asset_id").distinct == Seq(2L))
    assert(df.collect().map(_.getTimestamp(0)).min.compareTo(ts("2020-01-03")) >= 0)
  }

  test("unknown ticker raises (ref parquet.py:63-65)") {
    val e = intercept[IllegalArgumentException] {
      handler.getPrices(Some(Seq("ZZZ")), None, None, None)
    }
    assert(e.getMessage.contains("ZZZ"))
  }

  test("unknown field raises (ref parquet.py:83-85)") {
    val e = intercept[IllegalArgumentException] {
      handler.getPrices(Some(Seq("AAA")), None, None, Some(Seq("nope")))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("missing dataset raises FileNotFound (ref parquet.py:43-44)") {
    val bad = new LocalParquetDataHandler(spark, root + "/nope")
    intercept[java.io.FileNotFoundException] { bad.getPrices(None, None, None, None) }
  }

  test("empty ticker list means no filter (ref parquet.py:96-98)") {
    val df = handler.getPrices(Some(Seq.empty), None, None, None)
    assert(values(df, "asset_id").distinct.toSet == Set(1L, 2L))
  }

  test("results sorted by (date, asset_id) (ref parquet.py:101)") {
    val df = handler.getPrices(None, None, None, None)
    val keys = df.collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toSeq
    assert(keys == keys.sorted)
  }

  // Same handler API over a Layout.writeDatePartitioned panel: identical
  // rows and schema, and the date bounds become PARTITION predicates so
  // the scan prunes whole month directories (the 100 TB read path).
  private lazy val partRoot: String = {
    import org.apache.spark.sql.functions.expr
    val dir = Files.createTempDirectory("graft-fixture-part").toString
    spark.read.parquet(s"$root/data_meta/assets_master.parquet")
      .write.parquet(s"$dir/data_meta/assets_master.parquet")
    // add a February copy of the January fixture so a January range query
    // has a directory to prune
    val jan = spark.read.parquet(s"$root/data_processed/prices_daily.parquet")
    val feb = jan.withColumn("date", expr("date + INTERVAL 31 DAYS"))
    Layout.writeDatePartitioned(jan.unionByName(feb),
      s"$dir/data_processed/prices_daily.parquet")
    dir
  }

  test("date-partitioned panel reads identically and prunes partitions") {
    val ph = new LocalParquetDataHandler(spark, partRoot)
    val part = ph.getPrices(None, Some("2020-01-02"), Some("2020-01-03"), None)
    val flat = handler.getPrices(None, Some("2020-01-02"), Some("2020-01-03"), None)
    assert(part.columns.toSeq == flat.columns.toSeq,
      "partition columns must never leak into the API schema")
    assert(part.collect().toSeq == flat.collect().toSeq)
    // the scan's metadata string truncates at maxMetadataStringLength
    // (default 100), which can cut the filter list mid-predicate when
    // attribute ids grow long in a shared session — widen it for the
    // probe, planning a FRESH frame inside the widened window (the conf
    // is captured when a plan first materializes, so re-printing an
    // already-executed frame keeps the old truncation)
    val prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    val plan = try {
      spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
      ph.getPrices(None, Some("2020-01-02"), Some("2020-01-03"), None)
        .queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    assert(plan.contains("PartitionFilters:") && plan.contains("_p_year"),
      s"date bounds must reach the scan as partition filters:\n$plan")
    assert(plan.contains("202001"),
      s"derived month bound (202001) missing from partition filters:\n$plan")
  }

  test("date-partitioned panel with no bounds still reads identically") {
    val ph = new LocalParquetDataHandler(spark, partRoot)
    val all = ph.getPrices(Some(Seq("AAA")), None, None, None)
    assert(all.count() == 10) // 5 January + 5 shifted-February rows
    assert(!all.columns.contains("_p_year") && !all.columns.contains("_p_month"))
  }
}
