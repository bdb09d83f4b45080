package graft

import org.apache.spark.sql.functions._

import graft.queries.Relational

/** Semantics of the exact integer EWMA (w4): adaptive head normalization
  * and the hand-computed steady-state weighted mean, both bit-exact.
  */
class WindowSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("w4 EWMA: head equals the first value; steady state equals the hand-computed weighted mean") {
    val weights = Relational.ewmaWeights
    val taps = Relational.ewmaTaps

    val daily = Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag").as("flag"), to_date(col("l_shipdate")).as("date"))
      .agg(sum(Exact.units(col("l_quantity"), 0)).as("qty"))
      .orderBy("flag", "date")
      .collect()
      .map(r => (r.getAs[String]("flag"), r.getAs[java.sql.Date]("date"), r.getAs[Long]("qty")))
    val series: Map[String, Array[(java.sql.Date, Long)]] =
      daily.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap

    val out = Relational.w4Ewma(spark, dir).collect()
      .map(r => (r.getAs[String]("flag"), r.getAs[java.sql.Date]("date")) ->
        (r.getAs[Double]("ewma_qty"), r.getAs[Long]("n_taps"))).toMap

    series.foreach { case (flag, s) =>
      // head: one tap, EWMA is exactly the first daily value
      val (d0, q0) = s.head
      val (head, headTaps) = out((flag, d0))
      assert(headTaps == 1L && head == q0.toDouble, s"$flag head: $head vs $q0")

      // every row: recompute the exact integer numerator/denominator
      s.indices.foreach { t =>
        val present = (0 until math.min(taps, t + 1))
        val num = present.map(j => s(t - j)._2 * weights(j)).sum
        val den = present.map(weights).sum
        val expected = num.toDouble / den.toDouble
        val (got, nTaps) = out((flag, s(t)._1))
        assert(nTaps == present.size.toLong, s"$flag t=$t taps $nTaps")
        assert(got == expected, s"$flag t=$t: $got vs $expected")
      }
    }
  }
}
