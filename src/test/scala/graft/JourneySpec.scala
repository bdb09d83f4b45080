package graft

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
}
