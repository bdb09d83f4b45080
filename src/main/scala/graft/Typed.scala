package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Typed views at the API edge (SURVEY.md §1.4): the storage layer stays
  * `DataFrame` (schemas vary along degraded paths), but consumers that
  * want compile-time field checks can lift handler results into
  * `Dataset[T]` with these row models. Nullable columns are `Option`s.
  */
object Typed {

  case class PriceRow(date: Timestamp, asset_id: Long, ticker: String,
      open: Option[Double], high: Option[Double], low: Option[Double],
      close: Option[Double], adj_close: Option[Double], volume: Option[Long])

  case class ReturnRow(date: Timestamp, asset_id: Long, ticker: String,
      ret_1d: Option[Double])

  case class MacroRow(date: Timestamp, series_name: String, value: Option[Double])

  case class FactorRow(date: Timestamp, factor_name: String, ret: Option[Double])

  case class BenchmarkRow(date: Timestamp, benchmark_name: String,
      level: Option[Double], ret: Option[Double])

  implicit val priceEncoder: Encoder[PriceRow] = Encoders.product[PriceRow]
  implicit val returnEncoder: Encoder[ReturnRow] = Encoders.product[ReturnRow]
  implicit val macroEncoder: Encoder[MacroRow] = Encoders.product[MacroRow]
  implicit val factorEncoder: Encoder[FactorRow] = Encoders.product[FactorRow]
  implicit val benchmarkEncoder: Encoder[BenchmarkRow] = Encoders.product[BenchmarkRow]

  def prices(handler: DataHandler, tickers: Option[Seq[String]] = None,
      start: Option[String] = None, end: Option[String] = None): Dataset[PriceRow] =
    handler.getPrices(tickers, start, end, None).as[PriceRow]

  def returns(handler: DataHandler, tickers: Option[Seq[String]] = None,
      start: Option[String] = None, end: Option[String] = None): Dataset[ReturnRow] =
    handler.getReturns(tickers, start, end).as[ReturnRow]

  def macroSeries(handler: DataHandler, start: Option[String] = None,
      end: Option[String] = None): Dataset[MacroRow] =
    handler.getMacro(start, end).as[MacroRow]

  def factors(handler: DataHandler, start: Option[String] = None,
      end: Option[String] = None): Dataset[FactorRow] =
    handler.getStyleFactorReturns(start, end).as[FactorRow]

  def benchmark(handler: DataHandler, name: String,
      start: Option[String] = None, end: Option[String] = None): Dataset[BenchmarkRow] =
    handler.getBenchmarkReturns(name, start, end).as[BenchmarkRow]
}
