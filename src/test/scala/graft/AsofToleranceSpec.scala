package graft

import org.apache.spark.sql.functions._
import graft.queries.Events

/** merge_asof semantics (direction + tolerance): every output row is
  * recomputed by hand from the collected event lists — backward = the
  * latest view at-or-before, forward = the earliest view at-or-after
  * (the negated-time machinery must reproduce this exactly, including
  * inclusive equality), tolerance nullifies each side independently,
  * and `nearest` picks the smaller delta with ties resolving backward.
  */
class AsofToleranceSpec extends SparkSpec {

  test("both directions, tolerance, and nearest recomputed by hand") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("tu"),
        r.getAs[Double]("value")))
    // per-(user, ts) views keep the max-event_id value (the engine's
    // max_by rule)
    val views = ev.filter(_._3 == "view")
      .groupBy(t => (t._2, t._4))
      .map { case ((u, tu), rows) => (u, tu, rows.maxBy(_._1)._5) }
      .toSeq
    val byUser = views.groupBy(_._1)
    val tolUs = 86400L * 1000000L
    val out = Events.evAsofTolerance(spark, dir).collect()
    val purchases = ev.filter(_._3 == "purchase")
    assert(out.length == purchases.length && out.nonEmpty)
    val outById = out.map(r => r.getAs[Long]("event_id") -> r).toMap
    var nBack = 0; var nFwd = 0; var nNone = 0
    purchases.foreach { case (eid, u, _, tu, _) =>
      val r = outById(eid)
      val vs = byUser.getOrElse(u, Seq.empty)
      val back = vs.filter(_._2 <= tu).sortBy(_._2).lastOption
      val fwd = vs.filter(_._2 >= tu).sortBy(_._2).headOption
      val bOk = back.exists(b => tu - b._2 <= tolUs)
      val fOk = fwd.exists(f => f._2 - tu <= tolUs)
      assert(r.isNullAt(r.fieldIndex("bview_ts")) == !bOk, s"b_ok $eid")
      assert(r.isNullAt(r.fieldIndex("fview_ts")) == !fOk, s"f_ok $eid")
      if (bOk) assert(r.getAs[Double]("bview_value") == back.get._3, s"bval $eid")
      if (fOk) assert(r.getAs[Double]("fview_value") == fwd.get._3, s"fval $eid")
      val nearest =
        if (bOk && (!fOk || (tu - back.get._2) <= (fwd.get._2 - tu))) "backward"
        else if (fOk) "forward" else "none"
      assert(r.getAs[String]("nearest") == nearest, s"nearest $eid")
      nearest match {
        case "backward" => nBack += 1
        case "forward" => nFwd += 1
        case _ => nNone += 1
      }
    }
    // the corpus must exercise all three resolutions or the pins above
    // prove less than they claim
    assert(nBack > 0 && nFwd > 0 && nNone > 0,
      s"degenerate corpus split: backward=$nBack forward=$nFwd none=$nNone")
  }
}
