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

  /** The shared per-nation daily revenue series, recomputed driver-side in
    * exact cents — the reference input for the W5/W6 hand checks.
    */
  private def nationSeries(): Map[Int, Array[(java.time.LocalDateTime, Double)]] = {
    val daily = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nationkey"), col("o_orderdate").as("date"))
      .agg((sum(Exact.units(col("o_totalprice"), 2)) / lit(100.0)).as("rev"))
      .orderBy("nationkey", "date")
      .collect()
      .map(r => (r.getAs[Int]("nationkey"), r.getAs[java.time.LocalDateTime]("date"),
        r.getAs[Double]("rev")))
    daily.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap
  }

  test("w5 rolling median: equals the sorted-frame selection recomputed by hand") {
    val series = nationSeries()
    val out = Relational.w5RollingMedian(spark, dir).collect()
      .map(r => (r.getAs[Int]("nationkey"), r.getAs[java.time.LocalDateTime]("date")) ->
        r.getAs[Double]("med5")).toMap
    assert(out.size == series.valuesIterator.map(_.length).sum)
    series.foreach { case (nk, s) =>
      s.indices.foreach { t =>
        val frame = s.slice(math.max(0, t - 4), t + 1).map(_._2).sorted
        val n = frame.length
        val expected = (frame((n + 1) / 2 - 1) + frame(n / 2)) / 2.0
        val got = out((nk, s(t)._1))
        assert(got == expected, s"nation $nk t=$t: $got vs $expected")
      }
    }
  }

  test("w6 drawdown: sequential compounding, monotone peak, trough recovered by hand") {
    val series = nationSeries()
    val out = Relational.w6Drawdown(spark, dir).collect()
      .map(r => (r.getAs[Int]("nationkey"), r.getAs[java.time.LocalDateTime]("date")) ->
        (r.getAs[Double]("level"), r.getAs[Double]("peak"), r.getAs[Double]("drawdown")))
      .toMap
    series.foreach { case (nk, s) =>
      var prod = 1.0
      var prevRev = Double.NaN
      var peak = Double.MinValue
      s.indices.foreach { t =>
        val rev = s(t)._2
        val ret = if (t == 0) 0.0 else rev / prevRev - 1.0
        // left-to-right sequential product, the order both engines commit
        // to, with the *100 scaling applied LAST (as both plans do)
        prod = prod * (1.0 + ret)
        val level = prod * 100.0
        peak = math.max(peak, level)
        prevRev = rev
        val (gl, gp, gd) = out((nk, s(t)._1))
        assert(gl == level, s"nation $nk t=$t level: $gl vs $level")
        assert(gp == peak && gp >= gl, s"nation $nk t=$t peak: $gp vs $peak")
        assert(gd == gl / gp - 1.0 && gd <= 0.0, s"nation $nk t=$t dd: $gd")
      }
    }
  }

  test("w7 rolling corr: frame-ordered moment folds recomputed by hand; degenerate head is NULL") {
    val mkt = Tables(spark, dir, "orders")
      .groupBy(col("o_orderdate").as("date"))
      .agg((sum(Exact.units(col("o_totalprice"), 2)) / lit(100.0)).as("mkt"))
      .collect()
      .map(r => r.getAs[java.time.LocalDateTime]("date") -> r.getAs[Double]("mkt"))
      .toMap
    val series = nationSeries()
    val out = Relational.w7RollingCorr(spark, dir).collect()
      .map(r => (r.getAs[Int]("nationkey"), r.getAs[java.time.LocalDateTime]("date")) ->
        Option(r.get(r.fieldIndex("corr30"))).map(_.asInstanceOf[Double])).toMap
    series.foreach { case (nk, s) =>
      s.indices.foreach { t =>
        val frame = s.slice(math.max(0, t - 29), t + 1)
          .map { case (d, x) => (x, mkt(d)) }
        // the exact left-to-right folds both engines commit to
        var (sx, sy, sxy, sxx, syy) = (0.0, 0.0, 0.0, 0.0, 0.0)
        frame.foreach { case (x, y) =>
          sx += x; sy += y; sxy += x * y; sxx += x * x; syy += y * y
        }
        val n = frame.length.toDouble
        val (vx, vy) = (n * sxx - sx * sx, n * syy - sy * sy)
        val expected =
          if (vx <= 0.0 || vy <= 0.0) None
          else Some((n * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy)))
        val got = out((nk, s(t)._1))
        assert(got == expected, s"nation $nk t=$t: $got vs $expected")
        got.foreach(c => assert(c >= -1.0000000001 && c <= 1.0000000001))
      }
      // a 1-observation frame has exactly zero variance -> NULL, not NaN
      assert(out((nk, s.head._1)).isEmpty, s"nation $nk head must be NULL")
    }
  }

  test("w11 rolling beta: OLS closed form recomputed by hand; ties to w7's corr") {
    val mkt = Tables(spark, dir, "orders")
      .groupBy(col("o_orderdate").as("date"))
      .agg((sum(Exact.units(col("o_totalprice"), 2)) / lit(100.0)).as("mkt"))
      .collect()
      .map(r => r.getAs[java.time.LocalDateTime]("date") -> r.getAs[Double]("mkt"))
      .toMap
    val series = nationSeries()
    val out = Relational.w11RollingBeta(spark, dir).collect()
      .map(r => (r.getAs[Int]("nationkey"), r.getAs[java.time.LocalDateTime]("date")) ->
        ((Option(r.get(r.fieldIndex("beta30"))).map(_.asInstanceOf[Double]),
          Option(r.get(r.fieldIndex("alpha30"))).map(_.asInstanceOf[Double])))).toMap
    val corr = Relational.w7RollingCorr(spark, dir).collect()
      .map(r => (r.getAs[Int]("nationkey"), r.getAs[java.time.LocalDateTime]("date")) ->
        Option(r.get(r.fieldIndex("corr30"))).map(_.asInstanceOf[Double])).toMap
    series.foreach { case (nk, s) =>
      s.indices.foreach { t =>
        // x = market, y = the nation's series (the regression direction)
        val frame = s.slice(math.max(0, t - 29), t + 1)
          .map { case (d, y) => (mkt(d), y) }
        var (sx, sy, sxy, sxx, syy) = (0.0, 0.0, 0.0, 0.0, 0.0)
        frame.foreach { case (x, y) =>
          sx += x; sy += y; sxy += x * y; sxx += x * x; syy += y * y
        }
        val n = frame.length.toDouble
        val vx = n * sxx - sx * sx
        val expectedBeta =
          if (vx <= 0.0) None else Some((n * sxy - sx * sy) / vx)
        val expectedAlpha = expectedBeta.map(b => (sy - b * sx) / n)
        val (gb, ga) = out((nk, s(t)._1))
        assert(gb == expectedBeta && ga == expectedAlpha,
          s"nation $nk t=$t: ($gb, $ga) vs ($expectedBeta, $expectedAlpha)")
        // physics tie: corr = beta * sqrt(var_x / var_y) where both exist
        val vy = n * syy - sy * sy
        (gb, corr((nk, s(t)._1))) match {
          case (Some(b), Some(c)) if vy > 0.0 =>
            val tied = b * math.sqrt(vx / vy)
            assert(math.abs(tied - c) < 1e-9,
              s"nation $nk t=$t: beta-corr identity broke ($tied vs $c)")
          case _ => ()
        }
      }
      assert(out((nk, s.head._1))._1.isEmpty, s"nation $nk head must be NULL")
    }
  }

  test("w8 cross-section: selection cuts, clamping, and z-scores recomputed by hand") {
    // reshape the nation series into per-date cross-sections
    val byDate = nationSeries().toSeq
      .flatMap { case (nk, s) => s.map { case (d, x) => (d, nk, x) } }
      .groupBy(_._1)
    val out = Relational.w8CrossSection(spark, dir).collect()
      .map(r => (r.getAs[Int]("nationkey"), r.getAs[java.time.LocalDateTime]("date")) ->
        (r.getAs[Int]("xrank"), r.getAs[Double]("lo"), r.getAs[Double]("hi"),
          r.getAs[Double]("wr"),
          Option(r.get(r.fieldIndex("z"))).map(_.asInstanceOf[Double]))).toMap
    assert(out.size == byDate.valuesIterator.map(_.size).sum)
    byDate.foreach { case (d, rows) =>
      val sorted = rows.map(_._3).sorted
      val n = sorted.length
      val k = n / 10
      val (lo, hi) = (sorted(k), sorted(n - k - 1))
      val cw = sorted.map(x => math.min(math.max(x, lo), hi))
      var (sw, sww) = (0.0, 0.0)
      cw.foreach { x => sw += x; sww += x * x }
      val nd = n.toDouble
      val v = nd * sww - sw * sw
      val ranked = rows.sortBy { case (_, nk, x) => (-x, nk) }
        .zipWithIndex.map { case ((_, nk, _), i) => nk -> (i + 1) }.toMap
      rows.foreach { case (_, nk, x) =>
        val (grank, glo, ghi, gwr, gz) = out((nk, d))
        val wr = math.min(math.max(x, lo), hi)
        assert(grank == ranked(nk) && glo == lo && ghi == hi && gwr == wr,
          s"date $d nation $nk: rank/cuts/clamp mismatch")
        val ez = if (v <= 0.0) None
          else Some((wr - sw / nd) / math.sqrt(v / (nd * nd)))
        assert(gz == ez, s"date $d nation $nk z: $gz vs $ez")
      }
    }
  }

  test("w10 calendar ffill: hand-recomputed fill, leading gaps stay null") {
    val out = Relational.w10FfillCalendar(spark, dir).collect()
    val nDates = Tables(spark, dir, "orders")
      .select("o_orderdate").distinct().count()
    val nNations = Tables(spark, dir, "customer")
      .select("c_nationkey").distinct().count()
    assert(out.length.toLong == nDates * nNations,
      "the grid must be nations x calendar")
    var sawLeadingGap = false
    var sawFilledGap = false
    out.groupBy(_.getAs[Number]("nationkey").longValue()).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[java.time.LocalDateTime]("date")
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
      var lastSeen: Option[Double] = None
      sorted.foreach { r =>
        val rev = if (r.isNullAt(r.fieldIndex("rev"))) None
          else Some(r.getAs[Double]("rev"))
        if (rev.isDefined) lastSeen = rev
        val got = if (r.isNullAt(r.fieldIndex("rev_ffill"))) None
          else Some(r.getAs[Double]("rev_ffill"))
        assert(got == lastSeen, s"ffill drifted at $r")
        assert(r.getAs[Boolean]("was_gap") == rev.isEmpty)
        if (rev.isEmpty && lastSeen.isEmpty) sawLeadingGap = true
        if (rev.isEmpty && lastSeen.isDefined) sawFilledGap = true
      }
    }
    assert(sawFilledGap, "corpus must exercise actual fills")
    assert(sawLeadingGap, "corpus must exercise the leading-gap NULL rule")
  }

  test("w9 weekly OHLC: bars recomputed by hand from the daily series") {
    val daily = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nationkey"), col("o_orderdate").as("date"))
      .agg(sum(Exact.units(col("o_totalprice"), 2)).as("cents"))
      .withColumn("wk",
        expr("datediff(CAST(date AS DATE), DATE '1990-01-01') div 7"))
      .withColumn("date", col("date").cast("string"))
      .collect()
      .map(r => (r.getAs[Number]("nationkey").longValue(),
        r.getAs[Number]("wk").longValue(),
        r.getAs[String]("date"), r.getAs[Long]("cents")))
    val byBar = daily.groupBy(t => (t._1, t._2))
    val out = Relational.w9ResampleOhlc(spark, dir).collect()
    assert(out.length == byBar.size, "one bar per (nation, week)")
    out.foreach { r =>
      val key = (r.getAs[Number]("nationkey").longValue(),
        r.getAs[Number]("wk").longValue())
      val mem = byBar(key).sortBy(_._3)
      assert(r.getAs[Long]("n_days") == mem.length)
      assert(r.getAs[Double]("open") == mem.head._4 / 100.0, s"open $key")
      assert(r.getAs[Double]("close") == mem.last._4 / 100.0, s"close $key")
      assert(r.getAs[Double]("high") == mem.map(_._4).max / 100.0)
      assert(r.getAs[Double]("low") == mem.map(_._4).min / 100.0)
      assert(r.getAs[Double]("week_rev") == mem.map(_._4).sum / 100.0)
      assert(r.getAs[Long]("n_days") >= 1 && r.getAs[Long]("n_days") <= 7)
      // OHLC sanity: extremes bracket the endpoints
      assert(r.getAs[Double]("high") >=
        math.max(r.getAs[Double]("open"), r.getAs[Double]("close")))
      assert(r.getAs[Double]("low") <=
        math.min(r.getAs[Double]("open"), r.getAs[Double]("close")))
    }
  }

  test("w12RankIc: the served rho matches a hand Spearman per date and stays in [-1, 1]") {
    import graft.queries.Relational
    val dir = "/root/testdata/sf0.01"
    val served = Relational.w12RankIc(spark, dir).collect()
    assert(served.nonEmpty)
    served.foreach { r =>
      val (n, d2, ic) = (r.getAs[Long]("n"), r.getAs[Long]("sum_d2"),
        r.getAs[Double]("rank_ic"))
      assert(n >= Relational.icMinNames)
      assert(ic >= -1.0 && ic <= 1.0, s"rho out of range: $r")
      assert(ic == 1.0 - 6.0 * d2 / (n * (n * n - 1)).toDouble,
        s"rho formula drifted: $r")
      assert((d2 == 0L) == (ic == 1.0))
    }
    // hand recompute on the widest date from the raw panel
    val panel = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"), col("o_orderdate").as("date"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rc"))
      .collect().map(r => (r.getAs[Int]("nk").toLong,
        r.getAs[java.time.LocalDateTime]("date"), r.getAs[Long]("rc")))
    val fwd = panel.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val s = rows.sortBy(_._2.toString).toSeq
      s.zip(s.tail).map { case ((nk, d, rc), (_, _, rcNext)) =>
        (d, nk, rc, rcNext) }
    }
    val (bestDate, cross) = fwd.groupBy(_._1).maxBy(_._2.size)
    val ra = cross.sortBy(c => (-c._3, c._2)).zipWithIndex
      .map { case (c, i) => c._2 -> (i + 1) }.toMap
    val rb = cross.sortBy(c => (-c._4, c._2)).zipWithIndex
      .map { case (c, i) => c._2 -> (i + 1) }.toMap
    val n = cross.size.toLong
    val d2 = cross.map(c => { val d = ra(c._2) - rb(c._2); d.toLong * d }).sum
    val expect = 1.0 - 6.0 * d2 / (n * (n * n - 1)).toDouble
    val got = served.find(
      _.getAs[java.time.LocalDateTime]("date") == bestDate)
    assert(got.isDefined, s"date $bestDate missing from the served IC series")
    assert(got.get.getAs[Double]("rank_ic") == expect &&
      got.get.getAs[Long]("sum_d2") == d2,
      s"hand Spearman ${expect} vs served ${got.get}")
  }

  test("w13IcDecay: horizon 1 aggregates exactly the w12 per-date series") {
    import graft.queries.Relational
    val dir = "/root/testdata/sf0.01"
    val decay = Relational.w13IcDecay(spark, dir).collect()
      .map(r => r.getAs[Int]("horizon") -> r).toMap
    assert(decay.keySet == Relational.icHorizons.toSet)
    // horizon 1 IS w12: same date count, same positive share, and the
    // mean is the date-ordered fold of w12's served ICs divided once
    val w12 = Relational.w12RankIc(spark, dir).collect() // date-ordered
    val h1 = decay(1)
    assert(h1.getAs[Long]("n_dates") == w12.length.toLong)
    assert(h1.getAs[Long]("n_pos") ==
      w12.count(_.getAs[Double]("rank_ic") > 0.0).toLong)
    val mean = w12.map(_.getAs[Double]("rank_ic"))
      .foldLeft(0.0)(_ + _) / w12.length.toDouble
    assert(h1.getAs[Double]("mean_ic") == mean)
    // longer horizons see strictly fewer (or equal) forward-complete dates
    assert(decay(5).getAs[Long]("n_dates") <= h1.getAs[Long]("n_dates"))
    assert(decay(21).getAs[Long]("n_dates") <= decay(5).getAs[Long]("n_dates"))
  }

  test("w16 VaR/ES: order statistic and tail mean recomputed by hand") {
    import graft.queries.Relational
    val dir = "/root/testdata/sf0.01"
    val served = Relational.w16VarEs(spark, dir).collect()
      .map(r => r.getAs[Int]("nationkey") -> r).toMap
    assert(served.nonEmpty)
    val panel = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"), col("o_orderdate").as("date"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rc"))
      .collect()
      .map(r => (r.getAs[Int]("nk"),
        r.getAs[java.time.LocalDateTime]("date").toString,
        r.getAs[Long]("rc")))
    panel.groupBy(_._1).foreach { case (nk, rows) =>
      val s = rows.sortBy(_._2).map(_._3)
      val chg = s.zip(s.tail).map { case (a, b) => b - a }.sorted
      if (chg.nonEmpty) {
        val r = served(nk)
        val k = (chg.length * 5 + 99) / 100
        assert(r.getAs[Long]("n_obs") == chg.length.toLong)
        assert(r.getAs[Long]("k") == k.toLong)
        assert(r.getAs[Long]("var95_cents") == chg(k - 1), s"$nk VaR")
        assert(r.getAs[Long]("worst_chg") == chg.head)
        val es = chg.take(k).map(_.toDouble).foldLeft(0.0)(_ + _) / k.toDouble
        assert(r.getAs[Double]("es95") == es, s"$nk ES")
        // the tail mean never exceeds the cut point
        assert(r.getAs[Double]("es95") <=
          r.getAs[Long]("var95_cents").toDouble)
      }
    }
  }

  test("w15 CUSUM: closed form equals the hand recursion; alarms consistent") {
    import graft.queries.Relational
    val dir = "/root/testdata/sf0.01"
    val served = Relational.w15Changepoint(spark, dir).collect()
      .map(r => r.getAs[Int]("nationkey") -> r).toMap
    assert(served.nonEmpty)
    // hand recursion S_t = max(0, S_{t-1} + y_t) per nation from the panel
    val panel = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"), col("o_orderdate").as("date"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rc"))
      .collect()
      .map(r => (r.getAs[Int]("nk"),
        r.getAs[java.time.LocalDateTime]("date").toString,
        r.getAs[Long]("rc")))
    panel.groupBy(_._1).foreach { case (nk, rows) =>
      val s = rows.sortBy(_._2).map(_._3)
      if (s.length <= 28) assert(!served.contains(nk), s"$nk lacks burn-in")
      else {
        val m28 = s.take(28).sum
        var cusum = 0L; var nal = 0L; var mx = 0L
        s.drop(28).foreach { x =>
          cusum = math.max(0L, cusum + (28L * x - m28 - m28 / 8))
          mx = math.max(mx, cusum)
          if (cusum > m28) nal += 1
        }
        val r = served(nk)
        assert(r.getAs[Long]("m28") == m28, s"$nk m28")
        assert(r.getAs[Long]("n_obs") == (s.length - 28).toLong)
        assert(r.getAs[Long]("n_alarms") == nal,
          s"$nk alarms: served ${r.getAs[Long]("n_alarms")} vs hand $nal")
        assert(r.getAs[Long]("max_s") == mx, s"$nk max_s")
      }
    }
  }

  test("w18 underwater: streaks recomputed by hand from the w6 curve") {
    import graft.queries.Relational
    val dir = "/root/testdata/sf0.01"
    val curve = Relational.w6Drawdown(spark, dir).collect()
      .groupBy(_.getAs[Int]("nationkey"))
    val rows = Relational.w18Underwater(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = curve(r.getAs[Int]("nationkey"))
        .sortBy(_.getAs[java.time.LocalDateTime]("date").toString)
      var lastPeak = 0
      var under = Vector.empty[Long]
      s.zipWithIndex.foreach { case (row, i) =>
        if (row.getAs[Double]("level") >= row.getAs[Double]("peak"))
          lastPeak = i
        under :+= (i - lastPeak).toLong
      }
      assert(r.getAs[Long]("n_days") == s.length.toLong)
      assert(r.getAs[Long]("n_underwater_days") == under.count(_ > 0).toLong)
      assert(r.getAs[Long]("max_underwater_days") == under.max)
      assert(r.getAs[Long]("open_underwater_days") == under.last)
    }
  }

  test("w17 concentration: HHI recomputed by hand in exact longs") {
    import graft.queries.Relational
    val dir = "/root/testdata/sf0.01"
    val rows = Relational.w17Concentration(spark, dir).collect()
    assert(rows.nonEmpty)
    // independent recompute: per (date, nation) cents, then floor-div
    // ppm shares and HHI in Scala long arithmetic
    val daily = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("o_orderdate").as("d"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rc"))
      .collect()
      .groupBy(_.getAs[java.time.LocalDateTime]("d"))
      .map { case (d, rs) => d -> rs.map(_.getAs[Long]("rc")).toSeq }
    rows.foreach { r =>
      val cents = daily(r.getAs[java.time.LocalDateTime]("date"))
      val tot = cents.sum
      val shares = cents.map(c => c * 1000000L / tot)
      assert(r.getAs[Long]("n_nations") == cents.length.toLong)
      assert(r.getAs[Long]("total_cents") == tot)
      assert(r.getAs[Long]("top_share_ppm") == shares.max)
      assert(r.getAs[Long]("hhi_ppm2") == shares.map(s => s * s).sum)
      // bounds: a monopoly day is 1e12, shares never exceed 1e6
      assert(r.getAs[Long]("hhi_ppm2") <= 1000000000000L)
    }
  }

  test("w14 decomposition: trend recomputed by hand, seasonal centers, identity holds") {
    import graft.queries.Relational
    val dir = "/root/testdata/sf0.01"
    val rows = Relational.w14SeasonalDecompose(spark, dir).collect()
    assert(rows.nonEmpty)
    val byNation = rows.groupBy(_.getAs[Int]("nationkey"))
    byNation.foreach { case (nk, rs) =>
      val s = rs.sortBy(_.getAs[java.time.LocalDateTime]("date").toString)
      // trend exists exactly where the full centered window exists
      s.zipWithIndex.foreach { case (r, i) =>
        val full = i >= 3 && i < s.length - 3
        assert(r.isNullAt(r.fieldIndex("trend")) != full,
          s"nation $nk row $i: trend presence wrong")
        if (full) {
          val win = s.slice(i - 3, i + 4).map(_.getAs[Long]("rc")).sum
          assert(r.getAs[Double]("trend") == win.toDouble / 7.0,
            s"nation $nk row $i: trend drifted")
          // the scaled-integer companion is exact long arithmetic
          assert(r.getAs[Long]("detr7") == 7L * r.getAs[Long]("rc") - win,
            s"nation $nk row $i: detr7 companion inconsistent")
          // reconstruction: rev = trend + seasonal + resid (float assoc)
          val back = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
            r.getAs[Double]("resid")
          assert(math.abs(back - r.getAs[Long]("rc").toDouble) < 1e-6,
            s"nation $nk row $i: identity broken")
        }
      }
      // r14 normalization: seasonal subtracts the observation-WEIGHTED
      // grand mean, so the exact identity is Σ_d cnt_d · seasonal_d = 0
      // over the detrended observations (the unweighted 7-index sum is
      // no longer the centered quantity)
      val obs = s.filter(!_.isNullAt(s.head.fieldIndex("detr7")))
      if (obs.nonEmpty) {
        val wsum = obs.groupBy(_.getAs[Long]("dow")).map { case (_, rs) =>
          rs.head.getAs[Double]("seasonal") * rs.length
        }.sum
        assert(math.abs(wsum) < 1e-6,
          s"nation $nk: weighted seasonal indexes do not center")
      }
    }
  }

  test("w19 panel card: share conservation, drift algebra, status logic") {
    val rows = Relational.w19PanelCard(spark, dir).collect()
    assert(rows.nonEmpty)
    // both versions populated on the uniform TPC-H date range
    assert(rows.map(_.getAs[Long]("n_days_a")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_days_b")).sum > 0)
    // floor-division shares conserve to within one ppm per nation
    for (v <- Seq("a", "b")) {
      val s = rows.map(_.getAs[Long](s"share_${v}_ppm")).sum
      assert(s <= 1000000L && s > 1000000L - rows.length,
        s"version $v shares sum to $s")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("drift_ppm") ==
        r.getAs[Long]("share_b_ppm") - r.getAs[Long]("share_a_ppm"))
      val st = r.getAs[String]("status")
      assert(st == "steady" || st == "entered" || st == "exited")
      if (st == "steady") {
        assert(r.getAs[Long]("n_days_a") > 0 && r.getAs[Long]("n_days_b") > 0)
        // the picked lower median is an observed daily value inside the
        // version's revenue span
        assert(r.getAs[Long]("p50_day_rev_a") > 0L)
        assert(r.getAs[Long]("p50_day_rev_a") <= r.getAs[Long]("rev_a"))
      }
    }
  }
}
