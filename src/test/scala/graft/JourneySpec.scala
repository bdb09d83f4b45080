package graft

import org.apache.spark.sql.functions._

import graft.queries.Events

/** Journey-model pins: the Markov matrix is row-stochastic in exact
  * integers (per-from transition counts sum to the served denominator),
  * probabilities are the one-divide form, and the top-k path cut is
  * deterministic and consistent with the transition counts.
  */
class JourneySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("markov matrix is row-stochastic; probabilities are exact one-divide") {
    val rows = Events.evMarkovTransitions(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (f, rs) =>
      val nFrom = rs.map(_.getAs[Long]("n_from")).distinct
      assert(nFrom.size == 1, s"$f: inconsistent denominators")
      assert(rs.map(_.getAs[Long]("n_trans")).sum == nFrom.head,
        s"$f: transition counts do not sum to the denominator")
      rs.foreach { r =>
        assert(r.getAs[Double]("p") ==
          r.getAs[Long]("n_trans").toDouble / nFrom.head.toDouble)
      }
    }
  }

  test("top-k paths descend deterministically and agree with a direct recount") {
    val rows = Events.evPathTopk(spark, dir).collect()
    assert(rows.length == 20)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (na, nb) = (a.getAs[Long]("n"), b.getAs[Long]("n"))
        assert(na > nb || (na == nb &&
          a.getAs[String]("path") < b.getAs[String]("path")),
          s"cut order violated: $a then $b")
      case _ =>
    }
    // every served path is a real 3-gram: its two transition halves
    // exist in the Markov matrix
    val trans = Events.evMarkovTransitions(spark, dir).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")))
      .toSet
    rows.foreach { r =>
      val p = r.getAs[String]("path").split(">")
      assert(p.length == 3)
      assert(trans((p(0), p(1))) && trans((p(1), p(2))),
        s"path ${r.getAs[String]("path")} has a transition the matrix lacks")
    }
  }

  test("attribution conserves exactly 1M ppm per journey under every model") {
    val rows = Events.evAttribution(spark, dir).collect()
    assert(rows.nonEmpty)
    def total(c: String): Long = rows.map(_.getAs[Long](c)).sum
    val nJourneys = total("n_first")
    assert(nJourneys > 0)
    // one first and one last touch per journey
    assert(total("n_last") == nJourneys)
    // every credit model distributes exactly 1M ppm per journey — the
    // integer remainder-to-last rule leaves nothing on the floor
    for (m <- Seq("first_touch_ppm", "last_touch_ppm", "linear_ppm",
        "ushape_ppm"))
      assert(total(m) == 1000000L * nJourneys,
        s"$m: ${total(m)} != 1M x $nJourneys")
  }

  test("Kaplan-Meier hand-traces on planted lifetimes; corpus curve is a valid KM") {
    import spark.implicits._
    // lifetimes 1,1,3,5: S(1)=2/4, S(3)=1/2·1/2, S(5)=0
    val out = Events.kmOver(Seq(1L, 1L, 3L, 5L).toDF("lt")).collect()
      .map(r => r.getAs[Long]("t_days") ->
        (r.getAs[Long]("n_risk"), r.getAs[Long]("n_events"),
          r.getAs[Double]("survival"))).toMap
    assert(out(1L) == ((4L, 2L, 0.5)))
    assert(out(3L) == ((2L, 1L, 0.25)))
    assert(out(5L) == ((1L, 1L, 0.0)))
    // the corpus curve obeys the KM recurrence exactly and ends at zero
    val rows = Events.evSurvivalKm(spark, dir).collect()
      .sortBy(_.getAs[Long]("t_days"))
    assert(rows.nonEmpty)
    var s = 1.0
    rows.foreach { r =>
      s = s * (r.getAs[Long]("n_risk") - r.getAs[Long]("n_events"))
        .toDouble / r.getAs[Long]("n_risk").toDouble
      assert(r.getAs[Double]("survival") == s, r.toString)
    }
    assert(rows.last.getAs[Double]("survival") == 0.0,
      "uncensored curve must end at zero")
  }

  test("stationary distribution: one hand round, mass conservation, floor drift") {
    val mat = Events.evMarkovTransitions(spark, dir).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"),
        r.getAs[Long]("n_trans"), r.getAs[Long]("n_from")))
    val states = (mat.map(_._1) ++ mat.map(_._2)).distinct.sorted
    // round 1 by hand from the SERVED matrix (independent data path)
    val oneRound = Events.evMarkovStationary(spark, dir, rounds = 1)
      .collect().map(r => r.getAs[String]("state") -> r.getAs[Long]("pi_ppm"))
      .toMap
    states.foreach { j =>
      val expect = mat.filter(_._2 == j)
        .map { case (_, _, nij, ni) => 1000000L * nij / ni }.sum
      assert(oneRound(j) == expect, s"state $j round-1 mass")
    }
    // full run: mass conserved in the output column, floors only shrink
    val full = Events.evMarkovStationary(spark, dir).collect()
    val mass = full.map(_.getAs[Long]("pi_ppm")).sum
    assert(full.forall(_.getAs[Long]("mass_ppm") == mass))
    assert(mass <= 1000000L * states.length)
    assert(mass >= 1000000L * states.length - 1000L * states.length,
      s"floor drift implausibly large: $mass")
    assert(full.forall(_.getAs[Long]("pi_ppm") >= 0L))
  }

  test("Welch A/B report recomputes from raw purchase moments") {
    import org.apache.spark.sql.functions._
    val r = Events.evAbWelch(spark, dir).collect().head
    val cents = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().map(x => (x.getLong(0) % 2, x.getLong(1)))
    def m(v: Long) = cents.filter(_._1 == v).map(_._2)
    val (a, b) = (m(0), m(1))
    assert(r.getAs[Long]("n_a") == a.length.toLong)
    assert(r.getAs[Long]("n_b") == b.length.toLong)
    assert(r.getAs[Long]("sum_a") == a.sum)
    assert(r.getAs[Long]("ss_b") == b.map(x => x * x).sum)
    val meanA = a.sum.toDouble / a.length.toDouble
    assert(r.getAs[Double]("mean_a") == meanA)
    val varB = (b.length.toLong * b.map(x => x * x).sum -
      b.sum * b.sum).toDouble / (b.length.toLong * (b.length - 1)).toDouble
    assert(r.getAs[Double]("var_b") == varB)
    assert(r.getAs[Double]("t2") >= 0.0)
    assert(r.getAs[Double]("var_a") > 0.0 && varB > 0.0)
  }

  test("attribution credit arithmetic hand-traces on a planted journey") {
    import spark.implicits._
    def ev(id: Long, user: Long, s: Long, t: String) =
      (id, user, new java.sql.Timestamp(s * 1000L), t)
    // user 1: view,click -> purchase; signup -> purchase; trailing view
    // (unattributed, drops). user 2: a 5-touch journey exercising the
    // U-shape middle split 200000 div 3 with remainder to the last middle.
    val planted = Seq(
      ev(1, 1, 10, "view"), ev(2, 1, 20, "click"), ev(3, 1, 30, "purchase"),
      ev(4, 1, 40, "signup"), ev(5, 1, 50, "purchase"), ev(6, 1, 60, "view"),
      ev(10, 2, 10, "view"), ev(11, 2, 20, "click"), ev(12, 2, 30, "view"),
      ev(13, 2, 40, "click"), ev(14, 2, 50, "view"),
      ev(15, 2, 60, "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Events.attributionOver(planted).collect()
      .map(r => r.getAs[String]("channel") -> r).toMap
    // user 1, journey 1 (n=2): view idx1, click idx2. journey 2 (n=1):
    // signup. Trailing view (id 6) has no later purchase — drops.
    // user 2, one journey (n=5): view,click,view,click,view — U-shape
    // pays 400k to idx1/idx5 and 200000 div 3 = 66666 to each middle,
    // remainder 2 to the LAST middle (idx4).
    val click = out("click")
    assert(click.getAs[Long]("n_touches") == 3) // u1 idx2 + u2 idx2, idx4
    assert(click.getAs[Long]("n_first") == 0)
    assert(click.getAs[Long]("n_last") == 1) // u1 idx2 closes its journey
    assert(click.getAs[Long]("first_touch_ppm") == 0L)
    assert(click.getAs[Long]("last_touch_ppm") == 1000000L)
    // u1: 500000; u2 idx2 + idx4: 200000 each (1M div 5, remainder 0)
    assert(click.getAs[Long]("linear_ppm") == 500000L + 400000L)
    // u1: 500000; u2 idx2: 66666, idx4: 66666 + remainder 2
    assert(click.getAs[Long]("ushape_ppm") == 500000L + 66666L + 66668L)
    val signup = out("signup")
    assert(signup.getAs[Long]("n_touches") == 1)
    for (m <- Seq("first_touch_ppm", "last_touch_ppm", "linear_ppm",
        "ushape_ppm"))
      assert(signup.getAs[Long](m) == 1000000L, m)
    val view = out("view")
    // u1 idx1 (trailing view dropped) + u2 idx 1,3,5
    assert(view.getAs[Long]("n_touches") == 4)
    assert(view.getAs[Long]("n_first") == 2)
    assert(view.getAs[Long]("first_touch_ppm") == 2000000L)
    assert(view.getAs[Long]("last_touch_ppm") == 1000000L) // u2 idx5
    // u1: 500000; u2: 200000 x 3
    assert(view.getAs[Long]("linear_ppm") == 500000L + 600000L)
    // u1: 500000; u2: idx1 400000 + idx3 66666 + idx5 400000
    assert(view.getAs[Long]("ushape_ppm") == 500000L + 866666L)
    // conservation on the planted set: 3 journeys, every model sums 3M
    for (m <- Seq("first_touch_ppm", "last_touch_ppm", "linear_ppm",
        "ushape_ppm"))
      assert(out.values.map(_.getAs[Long](m)).sum == 3000000L, m)
  }

  test("interarrival quantiles: monotone, and p50 matches an in-memory selection") {
    import graft.queries.Events
    val rows = Events.evInterarrivalQuantiles(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_s") <= r.getAs[Long]("p50_s"))
      assert(r.getAs[Long]("p50_s") <= r.getAs[Long]("p90_s"))
      assert(r.getAs[Long]("p90_s") <= r.getAs[Long]("p99_s"))
      assert(r.getAs[Long]("p99_s") <= r.getAs[Long]("max_s"))
    }
    // independent selection for one type: sort the gaps, pick the
    // ceiling-rank element in plain Scala
    val et = rows.head.getAs[String]("event_type")
    val gaps = Tables(spark, dir, "events")
      .filter(col("event_type") === et)
      .select(col("user_id"), expr("unix_micros(ts)").as("ts_us"),
        col("event_id"))
      .collect()
      .groupBy(_.getLong(0)).values.flatMap { es =>
        es.sortBy(r => (r.getLong(1), r.getLong(2))).map(_.getLong(1))
          .toSeq.sliding(2).collect { case Seq(a, b) => (b - a) / 1000000L }
      }.toSeq.sorted
    val k = (gaps.length * 50 + 99) / 100
    assert(rows.head.getAs[Long]("n_gaps") == gaps.length.toLong)
    assert(rows.head.getAs[Long]("p50_s") == gaps(k - 1), s"type $et p50")
  }

  test("rfm segments: quintile populations balance and the grid conserves users") {
    import graft.queries.Events
    val rows = Events.evRfmSegments(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 125)
    val nUsers = Tables(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers,
      "the (r, f, m) grid must partition the user base exactly")
    // ntile law: each metric's five buckets differ by at most one user
    for ((qc, i) <- Seq("r_q", "f_q", "m_q").zipWithIndex) {
      val sizes = rows.groupBy(_.getAs[Int](qc))
        .map { case (_, rs) => rs.map(_.getAs[Long]("n_users")).sum }
      assert(sizes.size == 5, s"$qc must populate all five quintiles")
      assert(sizes.max - sizes.min <= 1L,
        s"$qc populations unbalanced: $sizes (i=$i)")
    }
    // monetary monotonicity: the top monetary quintile's mean spend
    // strictly exceeds the bottom's (the segmentation means something)
    def spendOf(q: Int): (Long, Long) = {
      val rs = rows.filter(_.getAs[Int]("m_q") == q)
      (rs.map(_.getAs[Long]("total_purchase_cents")).sum,
        rs.map(_.getAs[Long]("n_users")).sum)
    }
    val (loC, loN) = spendOf(1)
    val (hiC, hiN) = spendOf(5)
    assert(hiC * loN > loC * hiN,
      "top monetary quintile must out-spend the bottom per user")
  }
}
