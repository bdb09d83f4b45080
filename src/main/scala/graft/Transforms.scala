package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Pure `DataFrame => DataFrame` transforms — the testable heart of the
  * engine (SURVEY.md §7.1 step 2). One function per reference operator,
  * each a lazy declarative plan: no collects, no driver loops, shuffles
  * only where the semantics demand a grouping or join.
  */
object Transforms {

  /** Open-interval sentinel replacing `pd.Timestamp.max` (2262-04-11, a
    * pandas implementation artifact — `wrds_ingestion.py:582,603`). Valid
    * in Spark, Parquet and DuckDB alike.
    */
  val OpenEnd: Timestamp = Timestamp.valueOf("9999-12-31 00:00:00")

  /** S6: business-day trading calendar (`wrds_ingestion.py:155-157`).
    * Mon-Fri only — the reference's `pd.bdate_range` has no holiday
    * calendar. Generated distributed via sequence+explode.
    */
  def tradingCalendar(spark: SparkSession, start: String, end: String): DataFrame =
    spark.range(1)
      .select(explode(sequence(
        lit(start).cast("timestamp"), lit(end).cast("timestamp"),
        expr("INTERVAL 1 DAY"))).as("date"))
      .filter(weekday(col("date")) < 5)
      .withColumn("is_trading_day", lit(true))

  /** J11: expand per-asset membership intervals to one row per trading day
    * (`wrds_ingestion.py:160-166` — an iterrows loop there; a range join
    * here). The calendar side is dimension-sized, so it broadcasts; the
    * join never shuffles the (bigger) universe side by date.
    */
  def universeDaily(universe: DataFrame, calendar: DataFrame): DataFrame =
    calendar.select("date").join(broadcast(universe),
        col("date").between(col("start_date"), col("end_date")))
      .select(col("date"), col("permno").as("asset_id"),
        lit(true).as("in_sp500"))

  /** J8: dictionary ticker attach (`wrds_ingestion.py:440-443`) as a
    * broadcast left join — assets_master is ~1.2k rows.
    */
  def attachTickers(prices: DataFrame, assetsMaster: DataFrame): DataFrame =
    prices.join(
      broadcast(assetsMaster.select(col("asset_id"), col("ticker"))),
      Seq("asset_id"), "left")

  /** `_build_returns_from_crsp` (`wrds_ingestion.py:446-449`). */
  def buildReturns(prices: DataFrame): DataFrame =
    prices.select(col("date"), col("asset_id"), col("ticker"),
      col("ret").as("ret_1d"))

  /** F2 + J1/J2: delist-return compounding (`wrds_ingestion.py:452-477`),
    * schema-tolerant (`delret`→`dlret` rename; absent column synthesized
    * as 0): `ret' = (1+ret)*(1+coalesce(dlret,0)) - 1`.
    */
  def applyDelistReturns(returns: DataFrame, dlret: DataFrame,
      retCol: String = "ret_1d"): DataFrame = {
    if (dlret.isEmpty) return returns
    val normalized =
      if (dlret.columns.contains("dlret")) dlret
      else if (dlret.columns.contains("delret"))
        dlret.withColumnRenamed("delret", "dlret")
      else dlret.withColumn("dlret", lit(0.0))
    returns
      .join(normalized.select("asset_id", "date", "dlret"),
        Seq("asset_id", "date"), "left")
      .withColumn("dlret", coalesce(col("dlret"), lit(0.0)))
      .withColumn(retCol,
        (lit(1.0) + col(retCol)) * (lit(1.0) + col("dlret")) - lit(1.0))
      .drop("dlret")
  }

  /** Deterministic "first non-null in explicit order" aggregation — the
    * shuffle-safe replacement for the reference's order-dependent
    * `_first_non_null` reducer (`wrds_ingestion.py:230-232`; SURVEY.md
    * §7.4.1). For each value column, takes the value at the smallest
    * `orderCol` where it is non-null, via `min_by` with a null-masked
    * ordering key (rows with a null ordering key are ignored by min_by).
    *
    * Why this stays `min_by` despite the string-buffer SortAggregate (r11
    * measurement, VERDICT r10 item 2): with the input spread to cluster
    * width (`Tables.spread` — the actual r10 bottleneck was the ~1.2M-row
    * md5-seq projection + partial SortAggregate running on ONE core
    * because the testdata parquet is single-row-group), min_by measures
    * 2.9 s (j6) / 2.2 s (j7) warm at sf0.1 — EQUAL to a window rewrite
    * (sort + first-ignoreNulls + row_number: 2.9/2.5) and 2x FASTER than
    * the two-phase hash-agg plan (per-column min(masked seq) HashAggregate
    * + shuffle-hash join-back + winners-only final agg: 5.9/3.8, which
    * shuffles the full-width fact a second time and re-evaluates the seq
    * hash per side). At 100 TB the partial SortAggregate's local sort is
    * the same per-core O(n log n) the window rewrite pays, while its
    * map-side combine shuffles only one row per group — strictly fewer
    * bytes than either alternative. The per-column sort-agg compare cost
    * previously blamed (0.5 s/col) was a one-core artifact.
    */
  def firstNonNullBy(df: DataFrame, keys: Seq[String], valueCols: Seq[String],
      orderCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        min_by(col(valueCols.head),
          when(col(valueCols.head).isNotNull, col(orderCol))).as(valueCols.head),
        valueCols.tail.map(c =>
          min_by(col(c), when(col(c).isNotNull, col(orderCol))).as(c)): _*)

  /** A2/W3: assets-master dedup (`wrds_ingestion.py:235-253`): one row per
    * asset_id with ticker as of the most recent name record (latest
    * non-null-ticker row by last_date, nulls-first reversed scan like the
    * reference; asset_id-unique tiebreak by ticker for determinism),
    * min(first_date), max(last_date), min(ipodate).
    */
  def dedupeAssetsMaster(df: DataFrame): DataFrame = {
    val withIpo =
      if (df.columns.contains("ipodate")) df
      else df.withColumn("ipodate", lit(null).cast("timestamp"))
    val w = Window.partitionBy("asset_id")
      .orderBy(col("last_date").desc_nulls_first, col("ticker").asc)
    val tickers = withIpo.filter(col("ticker").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("asset_id"), col("ticker"))
    withIpo.groupBy("asset_id")
      .agg(min("first_date").as("first_date"),
        max("last_date").as("last_date"),
        min("ipodate").as("ipodate"))
      .join(tickers, Seq("asset_id"), "left")
      .select("asset_id", "ticker", "first_date", "last_date", "ipodate")
  }

  /** A3: consensus dedup (`wrds_ingestion.py:256-276`) — first non-null of
    * every metric column per (date, asset_id), made deterministic with an
    * explicit ordering column.
    */
  def dedupeConsensus(df: DataFrame, orderCol: String): DataFrame =
    firstNonNullBy(df,
      Seq("date", "asset_id"),
      df.columns.filterNot(Seq("date", "asset_id", orderCol).contains).toSeq,
      orderCol)

  /** A4: ratings-history dedup (`wrds_ingestion.py:279-290`). */
  def dedupeRatingsHistory(df: DataFrame, orderCol: String): DataFrame =
    firstNonNullBy(df,
      Seq("date", "asset_id", "analyst_id"),
      df.columns.filterNot(Seq("date", "asset_id", "analyst_id", orderCol).contains).toSeq,
      orderCol)

  /** F5: CUSIP normalization (`wrds_ingestion.py:554-555`). */
  def normalizeCusip(c: Column): Column =
    substring(regexp_replace(c, "[^A-Za-z0-9]", ""), 1, 8)

  /** J5 + F8/F9: IBES↔CRSP identity mapping via CUSIP-interval overlap
    * (`wrds_ingestion.py:545-627`). Open interval ends are filled with
    * [[OpenEnd]], both sides join on normalized cusip8, validity is the
    * interval intersection, empty or out-of-range intersections drop, and
    * the result dedups on the full mapping key.
    */
  def ibesCrspMapping(ibesIds: DataFrame, crspNames: DataFrame,
      start: String, end: String): DataFrame = {
    val ibes = ibesIds
      .withColumn("end_date", coalesce(col("end_date"), lit(OpenEnd)))
      .withColumn("cusip8", normalizeCusip(col("cusip")))
      .select(col("ticker"), col("cname"), col("cusip8"),
        col("start_date").as("start_ibes"), col("end_date").as("end_ibes"))
    val crsp = crspNames
      .withColumn("end_date", coalesce(col("end_date"), lit(OpenEnd)))
      .withColumn("cusip8", normalizeCusip(col("ncusip")))
      .select(col("asset_id"), col("cusip8"),
        col("start_date").as("start_crsp"), col("end_date").as("end_crsp"))
    ibes.join(crsp, Seq("cusip8"))
      .withColumn("start_date", greatest(col("start_ibes"), col("start_crsp")))
      .withColumn("end_date", least(col("end_ibes"), col("end_crsp")))
      .filter(col("start_date") <= lit(end).cast("timestamp") &&
        col("end_date") >= lit(start).cast("timestamp"))
      .select(col("asset_id"), col("ticker"),
        lit(null).cast("string").as("ibtic"), col("cname"),
        col("start_date"), col("end_date"))
      .dropDuplicates("asset_id", "ticker", "start_date", "end_date")
  }

  /** Friendly fundamentals names (`config/wrds_field_map.yml:1-11`). */
  val fundamentalsFieldMap: Map[String, String] = Map(
    "revt" -> "revenue", "sale" -> "sales", "ni" -> "net_income",
    "at" -> "total_assets", "ceq" -> "common_equity",
    "dltt" -> "total_debt_long_term", "oancf" -> "cash_flow_from_operations",
    "capx" -> "capital_expenditures", "pstk" -> "preferred_stock",
    "xrd" -> "research_and_development")

  /** J3 + P7: link Compustat fundamentals to CRSP permnos
    * (`wrds_ingestion.py:514-541`): left join on gvkey with the interval
    * containment in the join condition, rename to report_date/asset_id,
    * conform to the canonical column set, apply friendly names.
    */
  def linkFundamentals(funda: DataFrame, links: DataFrame,
      fieldMap: Map[String, String] = fundamentalsFieldMap): DataFrame = {
    val joined = funda.join(links, Seq("gvkey"), "left")
      .where(col("datadate") >= col("linkdt") &&
        (col("linkenddt").isNull || col("datadate") <= col("linkenddt")))
      .withColumnRenamed("datadate", "report_date")
      .withColumnRenamed("permno", "asset_id")
    val canonical = Seq("report_date", "asset_id", "revt", "sale", "ni", "at",
      "ceq", "dltt", "pstk", "oancf", "capx", "xrd")
    val present = joined.columns.toSet
    val conformed = canonical.foldLeft(joined)((d, c) =>
      if (present.contains(c)) d else d.withColumn(c, lit(null).cast("double")))
      .select(canonical.map(col): _*)
    fieldMap.foldLeft(conformed) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
  }

  /** U2 + F3: Fama-French factors wide→long (`wrds_ingestion.py:895-943`):
    * percent scaling then stack to (date, factor_name, ret), dropping
    * null factor values. The reference divides the merged MOM column by
    * 100 twice (`:917` then `:925-926`) — a bug; we scale every factor
    * exactly once and document the divergence (SURVEY.md §7.4.5).
    */
  def factorsWideToLong(ff: DataFrame): DataFrame = {
    val factorCols = Seq("mktrf" -> "MKT", "smb" -> "SMB", "hml" -> "HML",
      "rmw" -> "RMW", "cma" -> "CMA", "umd" -> "MOM")
    val present = factorCols.filter { case (c, _) => ff.columns.contains(c) }
    val stackArgs = present
      .map { case (c, name) => s"'$name', $c / 100.0D" }
      .mkString(", ")
    ff.select(col("date"),
        expr(s"stack(${present.size}, $stackArgs)").as(Seq("factor_name", "ret")))
      .na.drop(Seq("ret"))
  }

  /** W1: benchmark index level (`wrds_ingestion.py:996`):
    * `level = 100 * cumprod(1 + ret)` via the native running-frame
    * `product` aggregate — exact for any ret, including <= -100%.
    */
  def benchmarkLevel(bench: DataFrame): DataFrame = {
    val w = Window.orderBy("date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bench.withColumn("level", product(lit(1.0) + col("ret")).over(w) * lit(100.0))
  }

  /** A5 + J9 + F4: dividend cleaning (`wrds_ingestion.py:293-322`): attach
    * the daily close (preferred over any close already present), then per
    * (asset_id, date): sum(divamt) with pandas' sum-of-all-null == 0
    * semantics, first non-null of the remaining columns in `orderCol`
    * order, and `dividend_yield = divamt/close` guarded on null close.
    */
  def cleanDividends(dividends: DataFrame, pricesDaily: DataFrame,
      orderCol: String): DataFrame = {
    val withClose =
      if (pricesDaily != null &&
        Seq("asset_id", "date", "close").forall(pricesDaily.columns.contains)) {
        val lookup = pricesDaily.select(col("asset_id"), col("date"),
          col("close").as("close_daily"))
        val base = dividends.join(lookup, Seq("asset_id", "date"), "left")
        if (dividends.columns.contains("close"))
          base.withColumn("close", coalesce(col("close_daily"), col("close")))
            .drop("close_daily")
        else base.withColumnRenamed("close_daily", "close")
      } else if (dividends.columns.contains("close")) dividends
      else dividends.withColumn("close", lit(null).cast("double"))
    val firsts = Seq("distcd", "facpr", "facshr", "close")
      .filter(withClose.columns.contains)
    withClose.groupBy("asset_id", "date")
      .agg(coalesce(sum("divamt"), lit(0.0)).as("divamt"),
        firsts.map(c =>
          min_by(col(c), when(col(c).isNotNull, col(orderCol))).as(c)): _*)
      .withColumn("dividend_yield",
        when(col("close").isNotNull, col("divamt") / col("close")))
  }

  /** As-of join: for every left row, attach the latest right row with
    * `rightTime <= leftTime` per key — the point-in-time lookup quant
    * pipelines live on (the reference approximates it with interval
    * predicates, J3/P7). Implemented by composing built-ins (brief
    * preference (a)): tag both sides, union, and carry the last right
    * value forward with a running window — ONE shuffle on (key, time),
    * no per-row range probe, AQE/skew-handling compatible, scales to any
    * right-side size (vs. a broadcast interval join). Right values must
    * be unique per (key, rightTime); pre-dedup if not.
    *
    * valueCols are the right-side columns to attach; rows with no prior
    * right row get nulls (left semantics).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .select((keys.map(col) :+ col("__t") :+ col("__is_left")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__is_left", lit(0))
      .select((keys.map(col) :+ col("__t") :+ col("__is_left")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(col): _*)
    // Right rows sort BEFORE left rows at equal time (__is_left asc), so
    // rightTime == leftTime matches (inclusive as-of), matching DuckDB's
    // ASOF JOIN `ON l.t >= r.t`. The carried value is the whole right ROW
    // as a struct — carrying columns independently with ignoreNulls would
    // skip a newer right row's legitimate null and could stitch fields
    // from different right rows together.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__rrow",
        last(when(col("__is_left") === 0, struct(valueCols.map(col): _*)),
          ignoreNulls = true).over(w))
    carried.filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__rrow.$c").as(c)): _*)
  }

  /** §2.12: degraded-plan ladder — try each source builder in order,
    * falling back to a schema-stable empty frame if all fail
    * (`wrds_ingestion.py:810-843,637-682`).
    */
  def firstAvailable(spark: SparkSession, schema: StructType,
      candidates: Seq[() => DataFrame]): DataFrame =
    candidates.view
      .map(c => scala.util.Try(c()))
      .collectFirst { case scala.util.Success(df) => df }
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
}
