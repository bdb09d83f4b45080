package graft

import org.apache.spark.sql.DataFrame

/** Unified data-access API — the Spark port of the reference's abstract
  * `DataHandler` (`interfaces.py:13-101`): 9 query methods over the
  * processed datasets. Downstream code depends on this trait rather than
  * reading files directly, so backends can be swapped without refactors.
  *
  * Conventions carried over from the reference:
  *   - `tickers = None` (here `None`) means NO entity filter; so does an
  *     empty list (`parquet.py:96-98` — `if tickers` is falsy for `[]`).
  *   - date bounds are both inclusive (`parquet.py:68-76`).
  *   - unknown tickers and unknown fields raise (ValueError there,
  *     `IllegalArgumentException` here — `parquet.py:63-65,83-85`).
  *   - `fields` projections always retain the mandatory identity columns
  *     (`date`, `asset_id`, `ticker`), order-preserving (`parquet.py:78-86`).
  *   - every result is sorted by its documented key (`parquet.py:101,...,204`).
  */
trait DataHandler {

  /** Daily prices filtered by tickers/date range, optional field projection. */
  def getPrices(tickers: Option[Seq[String]],
      startDate: Option[String] = None, endDate: Option[String] = None,
      fields: Option[Seq[String]] = None): DataFrame

  /** Daily returns filtered by tickers/date range. */
  def getReturns(tickers: Option[Seq[String]],
      startDate: Option[String] = None, endDate: Option[String] = None): DataFrame

  /** Universe membership; if a date is given, that day's snapshot. */
  def getUniverse(date: Option[String] = None): DataFrame

  /** Quarterly fundamentals (friendly field names). */
  def getFundamentals(tickers: Option[Seq[String]],
      startDate: Option[String] = None, endDate: Option[String] = None): DataFrame

  /** Analyst consensus recommendations (I/B/E/S 1-5 scale). */
  def getAnalystConsensus(tickers: Option[Seq[String]],
      startDate: Option[String] = None, endDate: Option[String] = None,
      fields: Option[Seq[String]] = None): DataFrame

  /** Analyst-level recommendation history (point-in-time). */
  def getAnalystRatingsHistory(tickers: Option[Seq[String]],
      startDate: Option[String] = None, endDate: Option[String] = None,
      fields: Option[Seq[String]] = None): DataFrame

  /** Macro timeseries. */
  def getMacro(startDate: Option[String] = None,
      endDate: Option[String] = None): DataFrame

  /** Style factor returns. */
  def getStyleFactorReturns(startDate: Option[String] = None,
      endDate: Option[String] = None): DataFrame

  /** Benchmark price/returns for one benchmark name. */
  def getBenchmarkReturns(benchmark: String,
      startDate: Option[String] = None, endDate: Option[String] = None): DataFrame
}
