package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed [[DataHandler]] (`storage/parquet.py:13-204`), rebuilt as
  * lazy Spark plans.
  *
  * Where the reference eagerly reads the whole file and then filters in
  * memory (`parquet.py:42-50,95-100` — no pushdown at all), every method
  * here composes `read → filter → project → sort` declaratively, so
  * Catalyst collapses it into a pruned, predicate-pushed parquet scan —
  * at 100 TB the scan reads only the matching row groups and columns.
  *
  * The ticker→asset_id map is the one deliberate driver-side structure:
  * assets_master is dimension-sized (~1.2k rows for the S&P 500 universe),
  * and the reference's ValueError-on-unknown-ticker contract
  * (`parquet.py:63-65`) requires knowing the miss before building the plan.
  * It is collected once and cached (`parquet.py:31,52-56` memoizes the
  * same way).
  */
class LocalParquetDataHandler(
    spark: SparkSession,
    dataRoot: String,
    processedDir: String = "data_processed",
    metaDir: String = "data_meta") extends DataHandler {

  private val processedPath = s"$dataRoot/$processedDir"
  private val metaPath = s"$dataRoot/$metaDir"

  /** Missing-dataset contract: FileNotFoundError in the reference
    * (`parquet.py:43-44`).
    */
  private def readParquet(path: String): DataFrame = {
    if (!Files.exists(Paths.get(path)))
      throw new java.io.FileNotFoundException(s"Missing dataset at $path")
    // datasets may be written date-partitioned (Layout); the reserved
    // partition columns are internal and never part of the API schema
    spark.read.parquet(path).drop("_p_year", "_p_month")
  }

  private lazy val tickerToAssetId: Map[String, Long] =
    readParquet(s"$metaPath/assets_master.parquet")
      .select(col("ticker"), col("asset_id").cast("long"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

  /** `parquet.py:58-66`: resolve tickers, raising on any unknown one.
    * None or an empty list mean "no filter" (`parquet.py:96-98`).
    */
  private def tickersToAssetIds(tickers: Option[Seq[String]]): Option[Seq[Long]] =
    tickers.filter(_.nonEmpty).map { ts =>
      val missing = ts.filterNot(tickerToAssetId.contains)
      if (missing.nonEmpty)
        throw new IllegalArgumentException(
          s"Tickers not found in assets_master: ${missing.mkString("[", ", ", "]")}")
      ts.map(tickerToAssetId)
    }

  private def filterAssets(df: DataFrame, tickers: Option[Seq[String]]): DataFrame =
    tickersToAssetIds(tickers) match {
      case Some(ids) => df.filter(col("asset_id").isin(ids: _*))
      case None => df
    }

  /** P4: inclusive date-range filter (`parquet.py:68-76`). */
  private def filterDates(df: DataFrame, dateCol: String,
      start: Option[String], end: Option[String]): DataFrame = {
    val afterStart = start.map(s => df.filter(col(dateCol) >= lit(s).cast("timestamp"))).getOrElse(df)
    end.map(e => afterStart.filter(col(dateCol) <= lit(e).cast("timestamp"))).getOrElse(afterStart)
  }

  /** P2: field projection with mandatory-column union, order-preserving
    * dedup, and error on unknown fields (`parquet.py:78-86`).
    */
  private def filterFields(df: DataFrame, fields: Option[Seq[String]],
      mandatory: Seq[String]): DataFrame =
    fields.filter(_.nonEmpty) match {
      case None => df
      case Some(fs) =>
        val keep = (mandatory ++ fs).distinct
        val missing = keep.filterNot(df.columns.contains)
        if (missing.nonEmpty)
          throw new IllegalArgumentException(
            s"Requested fields missing from dataset: ${missing.mkString("[", ", ", "]")}")
        df.select(keep.map(col): _*)
    }

  private val mandatoryCols = Seq("date", "asset_id", "ticker")

  override def getPrices(tickers: Option[Seq[String]],
      startDate: Option[String], endDate: Option[String],
      fields: Option[Seq[String]]): DataFrame = {
    val df = readParquet(s"$processedPath/prices_daily.parquet")
    filterFields(
      filterDates(filterAssets(df, tickers), "date", startDate, endDate),
      fields, mandatoryCols)
      .orderBy("date", "asset_id")
  }

  override def getReturns(tickers: Option[Seq[String]],
      startDate: Option[String], endDate: Option[String]): DataFrame =
    filterDates(
      filterAssets(readParquet(s"$processedPath/returns_daily.parquet"), tickers),
      "date", startDate, endDate)
      .orderBy("date", "asset_id")

  override def getUniverse(date: Option[String]): DataFrame = {
    val df = readParquet(s"$metaPath/universe_sp500.parquet")
    date.map(d => df.filter(col("date") === lit(d).cast("timestamp")))
      .getOrElse(df)
      .orderBy("date", "asset_id")
  }

  override def getFundamentals(tickers: Option[Seq[String]],
      startDate: Option[String], endDate: Option[String]): DataFrame = {
    val df = readParquet(s"$processedPath/fundamentals_quarterly.parquet")
    // Idempotent friendly rename (`parquet.py:136-138`): ingestion already
    // renamed, so only still-raw mnemonics are touched.
    val renamed = Transforms.fundamentalsFieldMap.foldLeft(
      filterDates(filterAssets(df, tickers), "report_date", startDate, endDate)) {
      case (d, (from, to)) =>
        if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    renamed.orderBy("report_date", "asset_id")
  }

  override def getAnalystConsensus(tickers: Option[Seq[String]],
      startDate: Option[String], endDate: Option[String],
      fields: Option[Seq[String]]): DataFrame =
    filterFields(
      filterDates(
        filterAssets(readParquet(s"$processedPath/analyst_consensus.parquet"), tickers),
        "date", startDate, endDate),
      fields, mandatoryCols)
      .orderBy("date", "asset_id")

  override def getAnalystRatingsHistory(tickers: Option[Seq[String]],
      startDate: Option[String], endDate: Option[String],
      fields: Option[Seq[String]]): DataFrame =
    filterFields(
      filterDates(
        filterAssets(readParquet(s"$processedPath/analyst_ratings_history.parquet"), tickers),
        "date", startDate, endDate),
      fields, mandatoryCols)
      .orderBy("date", "asset_id")

  override def getMacro(startDate: Option[String],
      endDate: Option[String]): DataFrame =
    filterDates(readParquet(s"$processedPath/macro_timeseries.parquet"),
      "date", startDate, endDate)
      .orderBy("date", "series_name")

  override def getStyleFactorReturns(startDate: Option[String],
      endDate: Option[String]): DataFrame =
    filterDates(readParquet(s"$processedPath/style_factor_returns.parquet"),
      "date", startDate, endDate)
      .orderBy("date", "factor_name")

  override def getBenchmarkReturns(benchmark: String,
      startDate: Option[String], endDate: Option[String]): DataFrame = {
    val raw = readParquet(s"$processedPath/benchmarks.parquet")
    // Back-compat schema repair (`parquet.py:196-201`): older files may
    // carry `ticker` instead of `benchmark_name`, or neither.
    val repaired =
      if (raw.columns.contains("benchmark_name")) raw
      else if (raw.columns.contains("ticker"))
        raw.withColumnRenamed("ticker", "benchmark_name")
      else raw.withColumn("benchmark_name", lit(benchmark))
    filterDates(repaired.filter(col("benchmark_name") === benchmark),
      "date", startDate, endDate)
      .orderBy("date")
  }
}
