package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Exact, Tables}

/** Join / window / dedup / set-op operators from SURVEY.md §2, re-expressed
  * over the driver testdata.
  *
  * Every reference join is an equi-join or equi+range join (SURVEY.md §2.4);
  * the shapes below mirror them one-to-one (scaladoc cites the reference
  * operator id + file:line). All fact-fact joins shuffle on their keys;
  * dimension-sized sides are broadcast. Outputs are aggregated or
  * key-filtered so verify dumps stay bounded at every scale factor.
  */
object Relational {

  /** J1/J2 + F2/F7 (delist-adjust, `wrds_ingestion.py:452-477`): left join a
    * fact table to a per-key adjustment side, default the missing rate to 0
    * via coalesce, compound multiplicatively. The adjustment side is built
    * with exact integer-unit division so both engines derive bit-identical
    * rates; the compounding is then a single IEEE multiply.
    */
  def j1DelistAdjust(spark: SparkSession, dir: String): DataFrame = {
    val adj = Tables(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .groupBy("l_orderkey")
      .agg(Exact.avgFixed(col("l_discount"), 2).as("dl_rate"))
    Tables(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .join(adj, col("o_orderkey") === col("l_orderkey"), "left")
      .select(
        col("o_orderkey"),
        col("o_totalprice"),
        col("dl_rate"),
        (col("o_totalprice") * (lit(1.0) + coalesce(col("dl_rate"), lit(0.0))))
          .as("adj_price"))
      .orderBy("o_orderkey")
  }

  /** J3 + P7 (fundamentals link join, `wrds_ingestion.py:514-518`): equi-join
    * plus interval-containment predicate *in the join condition* so Catalyst
    * plans it as a hash join with a post-join filter rather than a cartesian
    * range join. Aggregated per month to keep output bounded.
    */
  def j3IntervalContainment(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders").select("o_orderkey", "o_orderdate")
    val li = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_shipdate", "l_extendedprice")
    li.join(ord,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_items"),
        Exact.sumFixed(col("l_extendedprice"), 2).as("sum_price"))
      .orderBy("month")
  }

  /** J5 + F8 (IBES↔CRSP interval-overlap join, `wrds_ingestion.py:606-626`):
    * equi-join two per-entity validity intervals on a shared key, intersect
    * with greatest/least, drop empty intersections, measure overlap. The
    * per-entity intervals are min/max aggregates, so the join inputs shrink
    * from fact-size to entity-size before the many-to-many join — the same
    * pre-aggregation that keeps this viable at 100 TB.
    */
  def j5IntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val (custItv, suppItv) = j5Intervals(spark, dir)
    j5OverlapTail(
      custItv.join(suppItv, Seq("nationkey")))
  }

  /** The per-entity interval sides of J5, both keyed `nationkey` so the
    * plain and salted pair joins share one build text.
    */
  private def j5Intervals(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val custItv = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_nationkey")
      .agg(min("o_orderdate").as("c_start"), max("o_orderdate").as("c_end"))
      .withColumnRenamed("c_nationkey", "nationkey")
    val suppItv = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey", "s_nationkey")
      .agg(min("l_shipdate").as("s_start"), max("l_shipdate").as("s_end"))
      .withColumnRenamed("s_nationkey", "nationkey")
    (custItv, suppItv)
  }

  /** The shared J5 tail: intersect intervals, drop empties, measure. */
  private def j5OverlapTail(pairs: DataFrame): DataFrame =
    pairs
      .select(col("nationkey"),
        greatest(col("c_start"), col("s_start")).as("o_start"),
        least(col("c_end"), col("s_end")).as("o_end"))
      .filter(col("o_start") <= col("o_end"))
      .groupBy("nationkey")
      .agg(count(lit(1)).as("n_pairs"),
        sum(datediff(col("o_end"), col("o_start"))).as("total_overlap_days"))
      .orderBy("nationkey")

  /** J5 with the pair join SALTED (SURVEY §7.4.3 risk: the nation key has
    * ~25 values, so at 100 TB every key is hot and the many-to-many pair
    * block for one nation lands on ONE reducer — a shape AQE's skew
    * splitting cannot fix because a single join key group can't split).
    * [[graft.Skew.saltedShuffleJoin]] salts the customer side by
    * c_custkey (deterministic) and replicates the supplier side 8 ways,
    * spreading each nation over 8 reducers. Same intervals, same tail,
    * SAME ORACLE TEXT as j5_interval_overlap — salting may never change
    * the answer (the skew_salted_join rule); PlanSpec pins the
    * (nationkey, __salt) join keys under broadcast thresholds −1, the
    * regime the salt exists for.
    */
  def j5SaltedOverlap(spark: SparkSession, dir: String,
      factor: Int = 8): DataFrame = {
    val (custItv, suppItv) = j5Intervals(spark, dir)
    j5OverlapTail(graft.Skew.saltedShuffleJoin(
      custItv, suppItv, Seq("nationkey"), col("c_custkey"), factor))
  }

  /** J9 + F7 (dividend price-attach, `wrds_ingestion.py:297-308,1113`): two
    * left joins against alternative per-key value sources, preferring the
    * first via coalesce.
    */
  def j9CoalescePreference(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    def lineN(n: Int, as: String): DataFrame =
      li.filter(col("l_linenumber") === n)
        .select(col("l_orderkey").as(s"k$n"), col("l_extendedprice").as(as))
    Tables(spark, dir, "orders")
      .join(lineN(2, "p2"), col("o_orderkey") === col("k2"), "left")
      .join(lineN(3, "p3"), col("o_orderkey") === col("k3"), "left")
      .withColumn("close", coalesce(col("p2"), col("p3")))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        count(col("p2")).as("n_p2"),
        count(col("p3")).as("n_p3"),
        count(col("close")).as("n_close"),
        Exact.sumFixed(col("close"), 2).as("sum_close"))
      .orderBy("o_orderstatus")
  }

  /** J11 + S6 (universe×calendar expansion, `wrds_ingestion.py:160-166`):
    * expand per-key membership intervals to one row per business day via
    * distributed sequence+explode (the reference uses a driver-side
    * iterrows loop). The expansion happens on the small (per-entity
    * interval) side, never on the fact side.
    */
  def j11RangeExpansion(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(min("o_orderdate").as("m_start"), max("o_orderdate").as("m_end"))
      .select(col("nationkey"),
        explode(sequence(col("m_start"), col("m_end"), expr("INTERVAL 1 DAY")))
          .as("d"))
      .filter(weekday(col("d")) < 5)
      .groupBy("nationkey")
      .agg(count(lit(1)).as("n_trading_days"),
        min("d").as("first_day"), max("d").as("last_day"))
      .orderBy("nationkey")

  /** A2 variant (assets-master dedup, `wrds_ingestion.py:235-253`): one row
    * per key with the value as-of the maximum ordering column, via
    * `max_by` on a unique ordering key (deterministic — no shuffle-order
    * dependence, unlike bare `first`).
    */
  def a2ArgmaxDedup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max_by(col("o_orderpriority"), col("o_orderkey")).as("latest_priority"),
        min("o_orderdate").as("first_date"),
        max("o_orderdate").as("last_date"),
        count(lit(1)).as("n_orders"))
      .orderBy("custkey")

  /** W3 + O2 (ordered-dedup via row_number, `wrds_ingestion.py:241-246`):
    * latest row per key under an explicit multi-key ordering with a unique
    * tiebreak, the shuffle-safe replacement for pandas' order-dependent
    * `first()` (SURVEY.md §7.4.1).
    */
  def w3RownumberDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      .orderBy("custkey")
  }

  /** W2 (per-group pct_change, `test_local_parquet_data_handler.py:61`):
    * lag-based return series per nation over exact daily revenue. The
    * division of two bit-identical exact sums is itself bit-identical.
    */
  def w2PctChange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("nationkey").orderBy("date")
    nationDailyRevenue(spark, dir)
      .withColumn("ret", col("rev") / lag("rev", 1).over(w) - lit(1.0))
      .orderBy("nationkey", "date")
  }

  /** W1 (benchmark cumulative product, `wrds_ingestion.py:996`): index level
    * `100 * cumprod(1 + ret)` over an ordered running frame, using the
    * native `product` window aggregate (sequential in frame order — no
    * log/exp rounding detour, and defined for ret <= -1).
    */
  def w1CumulativeProduct(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "orders")
      .groupBy(col("o_orderdate").as("date"))
      .agg(Exact.sumFixed(col("o_totalprice"), 2).as("rev"))
    val wOrd = Window.orderBy("date")
    val wRun = Window.orderBy("date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("ret",
        coalesce(col("rev") / lag("rev", 1).over(wOrd) - lit(1.0), lit(0.0)))
      .withColumn("level", product(lit(1.0) + col("ret")).over(wRun) * lit(100.0))
      .orderBy("date")
  }

  /** U1 (concat frames, `wrds_ingestion.py:166,941,979`): union-by-name with
    * missing columns null-filled, then re-aggregated.
    */
  def u1UnionByName(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders")
    val urgent = ord.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    val low = ord.filter(col("o_orderpriority") === "5-LOW")
      .select(col("o_orderkey"), col("o_orderpriority"))
    urgent.unionByName(low, allowMissingColumns = true)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_totalprice")).as("n_priced"),
        Exact.sumFixed(col("o_totalprice"), 2).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** U2 (wide→long melt, `wrds_ingestion.py:927-941`): `stack` a wide frame
    * into (key, metric, value) rows, the distributed equivalent of
    * `pd.melt` used for the factor table.
    */
  def u2Melt(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .filter(col("c_custkey") <= 200)
      .select(col("c_custkey"),
        expr("stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE))")
          .as(Seq("metric", "value")))
      .orderBy("c_custkey", "metric")

  /** U5 (set operations): customers ordering in BOTH halves of 1995
    * (INTERSECT semantics) and first-half-only customers (EXCEPT
    * semantics), summarized per nation for a compact, deterministic
    * oracle row set. The oracle SQL stays literal INTERSECT/EXCEPT; the
    * Spark plan computes both memberships in ONE orders scan
    * (VERDICT r7 item 6): a single filtered pass aggregates per-customer
    * half-membership flags (`max(when(date < mid, 1))` — all partial-agg,
    * map-side combined), then a projection classifies each customer. The
    * previous INTERSECT/EXCEPT form scanned orders twice and planned two
    * aggregate pairs; this shape shuffles the fact table's customer keys
    * exactly once at any scale.
    */
  def u5SetOps(spark: SparkSession, dir: String): DataFrame = {
    val mid = expr("TIMESTAMP '1995-07-01'")
    val membership = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= expr("TIMESTAMP '1995-01-01'") &&
        col("o_orderdate") < expr("TIMESTAMP '1996-01-01'"))
      .groupBy("o_custkey")
      .agg(max(when(col("o_orderdate") < mid, 1).otherwise(0)).as("in_h1"),
        max(when(col("o_orderdate") >= mid, 1).otherwise(0)).as("in_h2"))
    membership
      .withColumn("kind",
        when(col("in_h1") === 1 && col("in_h2") === 1, "both_halves")
          .when(col("in_h1") === 1, "h1_only")) // h2-only → null, dropped
      .filter(col("kind").isNotNull)
      .join(Tables(spark, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey")), "o_custkey")
      .groupBy("kind", "c_nationkey")
      .agg(count(lit(1)).as("n_customers"),
        min("o_custkey").as("min_custkey"))
      .orderBy("kind", "c_nationkey")
  }

  /** F5 (CUSIP normalization, `wrds_ingestion.py:554-555`): strip
    * non-alphanumerics, upper-case, take the first 8 chars.
    */
  def f5StringNormalize(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .filter(col("c_custkey") <= 300)
      .select(col("c_custkey"),
        upper(substring(regexp_replace(col("c_name"), "[^A-Za-z0-9]", ""), 1, 8))
          .as("norm_id"))
      .orderBy("c_custkey")

  /** P5-style anti pattern: entities with no matching fact rows (left join +
    * null filter). The reference's equality-snapshot filter is
    * `parquet.py:119`; the null-handling contract is P6.
    */
  def p5AntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .join(Tables(spark, dir, "orders"), col("c_custkey") === col("o_custkey"),
        "left_anti") // never materializes matched pairs, unlike outer+IS NULL
      .select("c_custkey", "c_name", "c_nationkey")
      .orderBy("c_custkey")

  /** F14 (date string formatting, `wrds_ingestion.py:44,1157`): format
    * timestamps to string keys — here the per-month revenue ledger keyed
    * by a 'yyyy-MM' label.
    */
  def f14DateFormat(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month_key"))
      .agg(count(lit(1)).as("n_orders"),
        Exact.sumFixed(col("o_totalprice"), 2).as("sum_price"))
      .orderBy("month_key")

  /** P6 (null-drop, `wrds_ingestion.py:789,891`): `.na.drop` on join-produced
    * nulls — dropping rows whose subset columns are null.
    */
  def p6NullDrop(spark: SparkSession, dir: String): DataFrame = {
    val li2 = Tables(spark, dir, "lineitem")
      .filter(col("l_linenumber") === 4)
      .select(col("l_orderkey"), col("l_extendedprice").as("p4"))
    Tables(spark, dir, "orders")
      .join(li2, col("o_orderkey") === col("l_orderkey"), "left")
      .na.drop(Seq("p4"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        Exact.sumFixed(col("p4"), 2).as("sum_p4"))
      .orderBy("o_orderstatus")
  }

  /** Salted replicated join of the lineitem fact against the supplier
    * dimension, through [[graft.Skew.saltedBroadcastJoin]] — the join-side
    * companion of [[graft.queries.Events.evSkewSaltedAgg]]: when one join
    * key owns a disproportionate share of the fact and the dimension is
    * broadcast-sized, the fact side takes a synthetic salt in [0, 8) and
    * the dimension is exploded 8× so every (key, salt) pair still matches
    * — no reducer (and, under a broadcast, no single probe task's hash
    * bucket chain) owns the hot key alone. The salt changes the CARRIER,
    * never the answer: the revenue rollup is exact integer units, and the
    * DuckDB oracle runs the PLAIN join — the oracle gate itself proves
    * salted ≡ plain, while PlanSpec pins the salted shape so a regression
    * that silently drops the salt column cannot hide behind the identical
    * answers. Reference behavioral anchor: plain key-join semantics
    * (`wrds_ingestion.py:452-477` delist join); salting is the 100 TB
    * carrier for the same join.
    */
  /** Number of taps in [[w4Ewma]]'s truncated EWMA window. */
  val ewmaTaps: Int = 11

  /** Integer EWMA weights for λ = 15/16 over [[ewmaTaps]] taps:
    * `weight_j = 15^j · 16^(taps-1-j)` — the common-denominator form of
    * λ^j, so every weight is an exact BIGINT and the weighted sum needs no
    * floating point at all. Shared verbatim with the generated oracle SQL
    * (the kmeansCtes rule: one set of constants, two engines).
    */
  def ewmaWeights: Seq[Long] =
    (0 until ewmaTaps).map { j =>
      (BigInt(15).pow(j) * BigInt(16).pow(ewmaTaps - 1 - j)).toLong
    }

  /** W4 (exponentially weighted moving average): RiskMetrics-style EWMA of
    * daily shipped quantity per return flag, λ = 15/16, truncated to the
    * trailing [[ewmaTaps]] observations with adaptive head normalization —
    * pandas' `ewm(alpha=1/16, adjust=True)` restricted to a bounded
    * window, the form a distributed engine can compute exactly.
    * Behavioral anchor: the reference's momentum/returns window family
    * (`wrds_ingestion.py:984-996` cumulative index; W1/W2 here).
    *
    * Exactness: the numerator `Σ qty_{t-j} · 15^j · 16^(W-1-j)` and the
    * denominator `Σ_{present taps} 15^j · 16^(W-1-j)` are both exact
    * BIGINT sums (order-independent, shuffle-safe — the [[graft.Exact]]
    * argument), and the single final division of two identical int64s is
    * bit-identical IEEE on both engines. Headroom: max term ≈ daily_qty ·
    * 16^10 ≈ qty · 1.1e12, fine through ~8e6 units/day before int64
    * overflow — a per-series daily aggregate far above this corpus.
    *
    * Scale shape: the corpus pass is the partial-aggregated daily rollup;
    * the 11× tap expansion and self-join run on the bounded (flag, day)
    * aggregate, never on raw lineitem. The per-flag row_number window is
    * partitioned (3 series), not global.
    */
  def w4Ewma(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag").as("flag"), to_date(col("l_shipdate")).as("date"))
      .agg(sum(Exact.units(col("l_quantity"), 0)).as("qty"))
    val idx = daily.withColumn("t",
      row_number().over(Window.partitionBy("flag").orderBy("date")))
    val taps = ewmaWeights.zipWithIndex.map { case (wt, j) => (j, wt) }
    val terms = idx.select(col("flag"), col("date"), col("t"),
        explode(typedLit(taps)).as("w"))
      .select(col("flag"), col("date"), col("t"),
        col("w._1").as("j"), col("w._2").as("wt"))
    val lagd = idx.select(col("flag").as("lflag"), col("t").as("lt"),
      col("qty").as("lqty"))
    terms
      .join(lagd, col("lflag") === col("flag") && col("lt") === col("t") - col("j"))
      .groupBy("flag", "date")
      .agg(
        (sum(col("lqty") * col("wt")).cast("double") /
          sum(col("wt")).cast("double")).as("ewma_qty"),
        count(lit(1)).as("n_taps"))
      .orderBy("flag", "date")
  }

  /** Per-nation daily revenue rollup shared by the rolling-window family
    * (W2/W5/W6): orders joined to customer for the nation key, revenue
    * summed in exact integer cents ([[graft.Exact]]) so every downstream
    * window sees bit-identical inputs on both engines.
    */
  private def nationDailyRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nationkey"), col("o_orderdate").as("date"))
      .agg(Exact.sumFixed(col("o_totalprice"), 2).as("rev"))

  /** W5 (rolling median): 5-observation trailing median of per-nation daily
    * revenue — the robust-smoothing complement of the mean-family windows
    * (W4 EWMA), the shape pandas users write as
    * `rolling(5, min_periods=1).median()` over the reference's daily panel
    * (behavioral anchor: the returns window family,
    * `wrds_ingestion.py:984-996`).
    *
    * Exactness: the frame's values are collected in frame order, sorted,
    * and the median is computed by explicit selection — odd frames pick the
    * middle element exactly; even frames average the two middle elements
    * with a single IEEE add + divide, identical on both engines. No
    * engine-specific quantile interpolation is ever invoked (DuckDB's
    * `median()` interpolates as lo + (hi-lo)/2, which can differ from
    * (lo+hi)/2 in the last ulp — both engines run the SAME selection
    * formula instead). Head rows use the available prefix (min_periods=1
    * semantics, matching W4's adaptive head).
    *
    * Scale shape: the corpus pass is the partial-aggregated daily rollup;
    * the collect_list frame is bounded at 5 elements on the (nation, day)
    * aggregate, never on raw orders, and the window is partitioned by
    * nation — no global window over unbounded input.
    */
  def w5RollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("nationkey").orderBy("date").rowsBetween(-4, 0)
    nationDailyRevenue(spark, dir)
      .withColumn("s", sort_array(collect_list(col("rev")).over(w)))
      .withColumn("n", size(col("s")))
      .withColumn("med5",
        (element_at(col("s"), expr("CAST((n + 1) DIV 2 AS INT)")) +
          element_at(col("s"), expr("CAST(n DIV 2 + 1 AS INT)"))) / lit(2.0))
      .select(col("nationkey"), col("date"), col("rev"), col("med5"))
      .orderBy("nationkey", "date")
  }

  /** W6 (drawdown curve): per-nation cumulative revenue index (the W1
    * compounding, `wrds_ingestion.py:984-996`), its running peak, and the
    * drawdown `level/peak - 1` — the standard quant risk series computed
    * from the reference's benchmark-index construction.
    *
    * Exactness: returns divide bit-identical exact sums (the W2 argument);
    * the index level is a sequential running-frame product (Spark's
    * `product` window evaluates the frame in order; the oracle forces the
    * same left-to-right order with `list_reduce` over the ordered prefix —
    * the W1 rule, since DuckDB's windowed product merges partials in
    * segment-tree order and drifts in the last ulps); the running peak is
    * pure comparison; the final drawdown is one IEEE divide + subtract.
    *
    * Scale shape: windows are nation-partitioned over the bounded daily
    * aggregate — the corpus is read once for the rollup; nothing global.
    */
  def w6Drawdown(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("nationkey").orderBy("date")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nationDailyRevenue(spark, dir)
      .withColumn("ret",
        coalesce(col("rev") / lag("rev", 1).over(wOrd) - lit(1.0), lit(0.0)))
      .withColumn("level", product(lit(1.0) + col("ret")).over(wRun) * lit(100.0))
      .withColumn("peak", max("level").over(wRun))
      .withColumn("drawdown", col("level") / col("peak") - lit(1.0))
      .select(col("nationkey"), col("date"), col("level"), col("peak"), col("drawdown"))
      .orderBy("nationkey", "date")
  }

  /** W18 (time underwater — drawdown DURATION per nation): the risk
    * statistic that complements [[w6Drawdown]]'s depth — how LONG the
    * equity curve sits below its running peak: per row, days since the
    * last peak touch (`rn − max(peak-row rn so far)` — pure integer
    * window arithmetic over [[w6Drawdown]]'s exact level/peak chain;
    * `level >= peak` compares the IDENTICAL doubles both engines
    * materialize, the w6 hash already proves them bit-equal), rolled
    * up per nation: observation count, underwater days, the worst
    * streak, and the streak still open at the last observation
    * (max_by over the unique row index — selection, not arithmetic).
    * Every output column is a BIGINT.
    *
    * Scale shape: the one nation-keyed exchange serves all three
    * windows and the rollup (subset-key satisfaction); history bounds
    * only the w1-style prefix folds the level chain already pays.
    */
  def w18Underwater(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("nationkey").orderBy("date")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nationDailyRevenue(spark, dir)
      .withColumn("ret",
        coalesce(col("rev") / lag("rev", 1).over(wOrd) - lit(1.0), lit(0.0)))
      .withColumn("level",
        product(lit(1.0) + col("ret")).over(wRun) * lit(100.0))
      .withColumn("peak", max("level").over(wRun))
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("peak_rn",
        max(when(col("level") >= col("peak"), col("rn"))).over(wRun))
      .withColumn("under_days", col("rn") - col("peak_rn"))
      .groupBy("nationkey")
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("under_days") > 0, 1L).otherwise(0L))
          .as("n_underwater_days"),
        max("under_days").as("max_underwater_days"),
        max_by(col("under_days"), col("rn")).as("open_underwater_days"))
      .orderBy("nationkey")
  }

  /** W19 split date (the panel's two "release versions") — shared with
    * the generated oracle (the o5 shared-constant rule). The testdata's
    * order dates span 1995-01-01..2001-08-01 uniformly, so splitting at
    * the range midpoint populates both halves at every scale factor.
    */
  private[graft] val panelCardSplit = "1998-05-01"

  /** W19: DATASET-CARD DRIFT FOR THE QUANT PANEL (VERDICT r14 item 6) —
    * the release-diff discipline (`pipeline_corpus_drift`,
    * `tx_dataset_card`) applied to the orders panel: compare the daily
    * nation-revenue panel's early window (dates < [[panelCardSplit]],
    * "version a") against the late window ("version b") and report, per
    * nation, the card a panel reviewer reads between releases: coverage
    * (n_days), exact integer-cent revenue, revenue share in ppm, the
    * exact lower-median daily revenue (rank `(n+1) div 2` picked
    * element — the w16/ev_interarrival selection, never interpolated),
    * membership status (steady / entered / exited), and the share drift
    * in ppm (a subtraction of two non-negative integers — no signed
    * floor division to split the engines).
    *
    * Scale shape: one partial-aggregated daily rollup (the shared
    * w-family panel), a (nation, version)-partitioned rank window over
    * the bounded daily aggregate, version totals attached by the
    * bounded-window rule (≤ 2·|nations| rows), and a bounded full-outer
    * self-join for the a/b card — never an orders-sized shuffle beyond
    * the rollup.
    */
  def w19PanelCard(spark: SparkSession, dir: String): DataFrame = {
    val split = java.sql.Date.valueOf(panelCardSplit)
    val wnv = Window.partitionBy("nationkey", "ver")
    // the card needs UNDESCALED integer cents (shares and medians are
    // integer arithmetic); the shared panel's rev is the descaled double
    val cents = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nationkey"),
        col("o_orderdate").as("date"))
      .agg(sum(Exact.units(col("o_totalprice"), 2)).as("rev"))
    val per = cents
      .withColumn("ver",
        when(col("date") < lit(split), lit("a")).otherwise(lit("b")))
      .withColumn("rn",
        row_number().over(wnv.orderBy(col("rev").asc, col("date").asc)))
      .withColumn("cnt", count(lit(1)).over(wnv))
      .groupBy("nationkey", "ver")
      .agg(count(lit(1)).as("n_days"),
        sum("rev").as("rev_sum"),
        max(when(col("rn") === expr("(cnt + 1) div 2"), col("rev")))
          .as("p50_day_rev"))
    // ≤ 2·|nations| rows: the bounded-aggregate total-attach rule
    val shared = per
      .withColumn("ver_total",
        sum("rev_sum").over(Window.partitionBy("ver")))
      .withColumn("share_ppm", expr("rev_sum * 1000000 div ver_total"))
    def side(v: String) = shared.filter(col("ver") === v)
      .select(col("nationkey"), col("n_days").as(s"n_days_$v"),
        col("rev_sum").as(s"rev_$v"),
        col("p50_day_rev").as(s"p50_day_rev_$v"),
        col("share_ppm").as(s"share_${v}_ppm"))
    side("a").join(side("b"), Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_days_a"), lit(0L)).as("n_days_a"),
        coalesce(col("n_days_b"), lit(0L)).as("n_days_b"),
        coalesce(col("rev_a"), lit(0L)).as("rev_a"),
        coalesce(col("rev_b"), lit(0L)).as("rev_b"),
        coalesce(col("p50_day_rev_a"), lit(0L)).as("p50_day_rev_a"),
        coalesce(col("p50_day_rev_b"), lit(0L)).as("p50_day_rev_b"),
        coalesce(col("share_a_ppm"), lit(0L)).as("share_a_ppm"),
        coalesce(col("share_b_ppm"), lit(0L)).as("share_b_ppm"),
        when(col("share_a_ppm").isNull, lit("entered"))
          .when(col("share_b_ppm").isNull, lit("exited"))
          .otherwise(lit("steady")).as("status"),
        (coalesce(col("share_b_ppm"), lit(0L)) -
          coalesce(col("share_a_ppm"), lit(0L))).as("drift_ppm"))
      .orderBy("nationkey")
  }

  /** W7 (rolling correlation): trailing-30-observation Pearson
    * correlation of each nation's daily revenue against the all-nation
    * market total — the rolling-beta/correlation window every quant
    * stack computes from the reference's returns panel (behavioral
    * anchor: the factor-momentum join family, `wrds_ingestion.py:895-943`
    * pairs asset series with factor series the same way).
    *
    * Exactness: the inputs are exact integer-cent sums descaled once
    * (bit-identical on both engines); the five moment sums (Σx, Σy, Σxy,
    * Σx², Σy²) are LEFT-TO-RIGHT folds over the frame collected in
    * frame order — float addition is order-dependent, and both engines'
    * windowed list aggregates accumulate in frame order over the unique
    * (nation, date) key, so every fold runs the identical sequence (the
    * EWMA/W1 ordering discipline, without integer weights because Σxy
    * would overflow int64 at scale). The closed form then applies fixed
    * IEEE ops; zero-variance frames (n = 1, or a constant series) yield
    * NULL by exact comparison, never a NaN that engines may hash apart.
    *
    * Scale shape: two partial-aggregated daily rollups (corpus read
    * once per side), a date-keyed join of bounded aggregates, and a
    * nation-partitioned window whose frame is capped at 30 structs —
    * the interpreted fold runs on ≤ 30 elements per row, never on raw
    * orders.
    */
  def w7RollingCorr(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val global = Tables(spark, dir, "orders")
      .groupBy(col("o_orderdate").as("date"))
      .agg(Exact.sumFixed(col("o_totalprice"), 2).as("mkt"))
    val w = Window.partitionBy("nationkey").orderBy("date")
      .rowsBetween(-29, 0)
    nationDailyRevenue(spark, dir)
      .join(global, "date")
      .withColumn("fr",
        collect_list(struct(col("rev").as("x"), col("mkt").as("y"))).over(w))
      .withColumn("n", size(col("fr")).cast("double"))
      // ONE codegen'd five-accumulator loop (graft.functions
      // .RollingMoments5, r16-opt — guide §4.1): the five interpreted
      // scalar folds this replaces ran CodegenFallback per output row
      // (and a named_struct ACCUMULATOR fold measured slower still, 3.5
      // vs 2.8 s at sf0.1 — per-element allocation; the codegen'd loop
      // carries five primitive doubles, no allocation). Each sum's
      // addition order is identical to its standalone fold, so the
      // oracle hash is unchanged (VectorExpressionsSpec pins all five).
      .withColumn("m", expr("corr_moments5(fr)"))
      .withColumn("sx", col("m.sx"))
      .withColumn("sy", col("m.sy"))
      .withColumn("sxy", col("m.sxy"))
      .withColumn("sxx", col("m.sxx"))
      .withColumn("syy", col("m.syy"))
      .withColumn("corr30",
        when(col("n") * col("sxx") - col("sx") * col("sx") <= 0.0 ||
             col("n") * col("syy") - col("sy") * col("sy") <= 0.0, lit(null))
          .otherwise(
            (col("n") * col("sxy") - col("sx") * col("sy")) /
              (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                sqrt(col("n") * col("syy") - col("sy") * col("sy")))))
      .select(col("nationkey"), col("date"), col("rev"), col("mkt"),
        col("corr30"))
      .orderBy("nationkey", "date")
  }

  /** W11 (rolling regression beta + alpha, the CAPM primitive next to
    * [[w7RollingCorr]]'s correlation — the per-asset `ret ~ mkt` OLS
    * every factor model runs): over the same trailing-30 frame,
    * `beta = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)` with x = the market
    * series and y = the nation's series, and
    * `alpha = (Σy − beta·Σx) / n`. Same exactness mechanism as W7: the
    * five moment sums are LEFT-TO-RIGHT folds over the frame list in
    * frame order, so the closed forms are single IEEE expressions over
    * bit-identical operands in both engines; a zero-variance market
    * window yields NULL by exact comparison.
    */
  /** W12 (cross-sectional rank IC) — the factor-evaluation primitive a
    * quant research pipeline runs daily (Grinold & Kahn's information
    * coefficient, in its robust Spearman form): per date, the rank
    * correlation between today's signal (revenue) and the forward
    * realization (next observation's revenue per nation) across the
    * cross-section. Ranks are row_number with a deterministic nationkey
    * tiebreak — UNTIED by construction, so Spearman reduces to the
    * exact-difference form ρ = 1 − 6·Σd²/(n(n²−1)): every input to the
    * final expression is an exact integer and the one IEEE divide is
    * bit-identical across engines (the w-family exactness rule). Dates
    * with a cross-section thinner than [[icMinNames]] are dropped (an
    * IC over 2-3 names is noise; 4 is the widest cross-section the
    * smallest test scale carries, so the gate exercises both branches
    * at every SF — the threshold is part of the contract).
    * Behavioral anchor: the reference's momentum/factor join
    * (`wrds_ingestion.py:941-1001`) builds exactly this panel; the IC
    * is what its consumers compute downstream.
    *
    * Scale shape: one nation-keyed exchange for the forward shift, one
    * date-keyed exchange shared by both rank windows and the rollup;
    * cross-sections are bounded by the universe, never by history.
    */
  private[graft] val icMinNames = 4L

  def w12RankIc(spark: SparkSession, dir: String): DataFrame = {
    val wN = Window.partitionBy("nationkey").orderBy("date")
    val panel = nationDailyRevenue(spark, dir)
      .withColumn("fwd", lead("rev", 1).over(wN))
      .filter(col("fwd").isNotNull)
    val wra = Window.partitionBy("date")
      .orderBy(col("rev").desc, col("nationkey").asc)
    val wrb = Window.partitionBy("date")
      .orderBy(col("fwd").desc, col("nationkey").asc)
    panel
      .withColumn("ra", row_number().over(wra))
      .withColumn("rb", row_number().over(wrb))
      .groupBy("date")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST((ra - rb) * (ra - rb) AS BIGINT)")).as("sum_d2"))
      .filter(col("n") >= icMinNames)
      .withColumn("rank_ic",
        lit(1.0) - lit(6.0) * col("sum_d2") /
          (col("n") * (col("n") * col("n") - 1)).cast("double"))
      .select("date", "n", "sum_d2", "rank_ic")
      .orderBy("date")
  }

  /** IC-decay horizons — shared with the generated oracle (the
    * kmeansCtes one-definition rule).
    */
  private[graft] val icHorizons = Seq(1, 5, 21)

  /** W13 (IC decay curve) — the horizon sweep every factor evaluation
    * runs after [[w12RankIc]]'s single-horizon IC (Grinold & Kahn: a
    * signal's VALUE is its IC times its breadth, and its tradability is
    * how fast that IC decays as the forward window stretches): the
    * Spearman rank IC of today's signal against the realization 1, 5 and
    * 21 observations ahead, rolled up per horizon into the decay curve —
    * date count, positive-IC share numerator, and the date-ordered mean
    * IC. Same exactness mechanism as W12 (untied row_number ranks, the
    * exact-difference Spearman, one IEEE divide per date); the horizon
    * MEAN folds the per-date ICs in date order (the W7 ordered-fold
    * rule) and divides once.
    *
    * Scale shape: one nation-keyed exchange computes all three forward
    * shifts (the lead windows share partitioning and sort), each
    * horizon's rank windows share the date-keyed exchange, and the
    * decay rollup is 3 bounded rows. History length never inflates
    * state.
    */
  def w13IcDecay(spark: SparkSession, dir: String): DataFrame = {
    val wN = Window.partitionBy("nationkey").orderBy("date")
    // ONE nation-keyed window pass computes every horizon's forward
    // shift; the horizons then melt into (horizon, fwd) rows so a single
    // pair of (horizon, date)-keyed rank windows serves all three —
    // three per-horizon branches re-scanned the panel per horizon and
    // priced 3x (measured 2.3 s at sf0.1; the shared-exchange rule)
    val melted = icHorizons
      .foldLeft(nationDailyRevenue(spark, dir)) { (d, h) =>
        d.withColumn(s"f$h", lead("rev", h).over(wN))
      }
      .withColumn("hf", explode(array(icHorizons.map(h =>
        struct(lit(h).as("horizon"), col(s"f$h").as("fwd"))): _*)))
      .select(col("nationkey"), col("date"), col("rev"),
        col("hf.horizon").as("horizon"), col("hf.fwd").as("fwd"))
      .filter(col("fwd").isNotNull)
    val wra = Window.partitionBy("horizon", "date")
      .orderBy(col("rev").desc, col("nationkey").asc)
    val wrb = Window.partitionBy("horizon", "date")
      .orderBy(col("fwd").desc, col("nationkey").asc)
    val perDate = melted
      .withColumn("ra", row_number().over(wra))
      .withColumn("rb", row_number().over(wrb))
      .groupBy("horizon", "date")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST((ra - rb) * (ra - rb) AS BIGINT)")).as("sum_d2"))
      .filter(col("n") >= icMinNames)
      .withColumn("rank_ic",
        lit(1.0) - lit(6.0) * col("sum_d2") /
          (col("n") * (col("n") * col("n") - 1)).cast("double"))
      .select(col("horizon"), col("date"), col("rank_ic"))
    perDate
      .groupBy("horizon")
      .agg(count(lit(1)).as("n_dates"),
        sum(when(col("rank_ic") > 0.0, 1L).otherwise(0L)).as("n_pos"),
        sort_array(collect_list(struct(col("date"), col("rank_ic"))))
          .as("ics"))
      .withColumn("mean_ic",
        expr("aggregate(ics, 0D, (a, s) -> a + s.rank_ic)") /
          col("n_dates").cast("double"))
      .select("horizon", "n_dates", "n_pos", "mean_ic")
      .orderBy("horizon")
  }

  /** W14 (classical seasonal decomposition, additive, weekly period) —
    * the rev = trend + seasonal + residual split every ops/quant
    * dashboard runs before anomaly logic (the moving-average
    * decomposition of Kendall/Stuart; statsmodels'
    * `seasonal_decompose(period=7)`): trend is the 7-OBSERVATION
    * centered moving average (a ROWS -3..3 frame over the date-ordered
    * panel — with calendar gaps the frame spans more than 7 calendar
    * days; the `c7 = 7` completeness check counts observations, not
    * day span — the observation-window semantics, stated here on
    * purpose), detrended values average per (nation, day-of-week) into
    * raw seasonal indexes, the indexes center by subtracting the
    * GRAND (observation-weighted) mean of all detrended values — so
    * the seasonal component is exactly mean-zero over the panel — and
    * the residual is what remains.
    *
    * Exactness (integer-pinned, r14): revenue is exact integer cents,
    * so the 7-row window SUM is order-safe integer arithmetic and
    * trend is ONE divide; the detrended value is carried SCALED BY 7
    * as the exact BIGINT `detr7 = 7·rc − s7` (emitted as a companion
    * column), so both seasonal means are single divides of exact
    * integers and `seasonal` is one correctly-rounded IEEE subtract of
    * two correctly-rounded divides — NO double ever crosses an
    * aggregation, which makes the result independent of any engine's
    * fold order or list semantics. Day-of-week is pure date arithmetic
    * (days-since-epoch mod 7 — no engine dow() conventions). The
    * DuckDB twin casts every aggregate to BIGINT (HUGEINT sums turn
    * into float64 through pandas and hash-mismatch, r13 post-mortem).
    *
    * Scale shape: one nation-keyed exchange serves the trend window and
    * the (nation, dow) seasonal rollup (subset-key satisfaction); the
    * grand mean folds from the 7-row-per-nation dow rollup, and the
    * seasonal join is 7 rows per nation. History length bounds nothing.
    */
  def w14SeasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nationkey"),
        col("o_orderdate").as("date"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rc"))
    val w7 = Window.partitionBy("nationkey").orderBy("date")
      .rowsBetween(-3, 3)
    val det = daily
      .withColumn("dow",
        expr("CAST(datediff(date, DATE '1970-01-01') AS BIGINT) % 7"))
      .withColumn("s7", sum("rc").over(w7))
      .withColumn("c7", count(lit(1)).over(w7))
      .withColumn("trend",
        when(col("c7") === 7, col("s7").cast("double") / lit(7.0)))
      .withColumn("detr7",
        when(col("c7") === 7, lit(7L) * col("rc") - col("s7")))
      .select("nationkey", "date", "rc", "dow", "detr7", "trend")
      .localCheckpoint(false)
    val sd = det.filter(col("detr7").isNotNull)
      .groupBy("nationkey", "dow")
      .agg(sum("detr7").as("snum"), count(lit(1)).as("cnt"))
    val sm = sd.groupBy("nationkey")
      .agg(sum("snum").as("gnum"), sum("cnt").as("gn"))
    val sc = sd.join(sm, Seq("nationkey"))
      .select(col("nationkey"), col("dow"),
        (col("snum").cast("double") / (lit(7L) * col("cnt")).cast("double")
          - col("gnum").cast("double") / (lit(7L) * col("gn")).cast("double"))
          .as("seasonal"))
    det.join(sc, Seq("nationkey", "dow"), "left")
      .select(col("nationkey"), col("date"), col("rc"), col("dow"),
        col("detr7"), col("trend"), col("seasonal"),
        when(col("trend").isNotNull,
          col("rc").cast("double") - col("trend") - col("seasonal"))
          .as("resid"))
      .orderBy("nationkey", "date")
  }

  /** W15 (CUSUM changepoint detection, Page 1954) — the sequential
    * mean-shift detector ops teams run on revenue/volume series, beside
    * [[w14SeasonalDecompose]]'s decomposition and the anomaly bands:
    * per nation, a 28-observation burn-in fixes the reference level,
    * then the one-sided CUSUM S_t = max(0, S_{t−1} + (x_t − μ − κ))
    * accumulates upward drift and alarms past h. Computed in its CLOSED
    * FORM — S_t = P_t − min(0, min_{j≤t} P_j) over the prefix sums of
    * the drift-adjusted series — so the recursion becomes two plain
    * windows (cumulative sum + running min) instead of a sequential
    * fold. Everything is scaled by the burn-in length (y_t = 28·x_t −
    * m28 − κ28 with κ28 = m28 div 8, h28 = m28, x in exact cents), so
    * every operation is INTEGER arithmetic — no double crosses any
    * aggregation (the pagerank exp/libm rule). Nations without a full
    * burn-in drop (documented contract). Reported per nation: post-
    * burn-in observations, the reference sum, alarm count, first alarm
    * date, and the peak statistic.
    *
    * Scale shape: one nation-keyed exchange serves the burn-in rollup,
    * both CUSUM windows, and the final aggregate; history length never
    * inflates state beyond the window frames.
    */
  def w15Changepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nationkey"),
        col("o_orderdate").as("date"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rc"))
    val wN = Window.partitionBy("nationkey").orderBy("date")
    val idx = daily.withColumn("t", row_number().over(wN))
    val burn = idx.filter(col("t") <= 28)
      .groupBy("nationkey")
      .agg(sum("rc").as("m28"), count(lit(1)).as("nb"))
      .filter(col("nb") === 28)
      .select("nationkey", "m28")
    val det = idx.join(burn, Seq("nationkey"))
      .filter(col("t") > 28)
      .withColumn("y", expr("28 * rc - m28 - (m28 div 8)"))
      .withColumn("psum", sum("y").over(wN))
      .withColumn("pmin",
        least(lit(0L), min("psum").over(
          wN.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .withColumn("s", col("psum") - col("pmin"))
      .withColumn("alarm", col("s") > col("m28"))
    det.groupBy("nationkey", "m28")
      .agg(count(lit(1)).as("n_obs"),
        sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("alarm"), col("date"))).as("first_alarm_date"),
        max("s").as("max_s"))
      .select("nationkey", "n_obs", "m28", "n_alarms", "first_alarm_date",
        "max_s")
      .orderBy("nationkey")
  }

  /** W16 (historical VaR / expected shortfall at 95%) — the tail-risk
    * pair every risk desk reports, over day-over-day revenue changes
    * per nation: VaR₉₅ is pure SELECTION (the ⌈5%·n⌉-th smallest change
    * — an exact integer order statistic, the w8 winsorize-cut
    * discipline, no quantile interpolation) and ES₉₅ is the mean of
    * that tail — a value-ordered fold of exact integers with ONE
    * divide. The worst single change rides along. Everything before
    * the divide is integer arithmetic, and the tail SUM is emitted as
    * the exact BIGINT companion `es95_num_cents` (r14 integer-pinning:
    * `es95` is that numerator's single divide by k, so no double
    * depends on any engine's fold/slice semantics; the DuckDB twin
    * ranks with a window instead of a variable-bound list slice and
    * casts every aggregate to BIGINT — HUGEINT-through-pandas was the
    * r13 hash mismatch).
    *
    * Scale shape: one nation-keyed exchange for the lag window and the
    * per-nation rollup; the sorted frame is bounded by history per
    * nation (the w-family collect_list shape).
    */
  def w16VarEs(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nationkey"),
        col("o_orderdate").as("date"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rc"))
    val wN = Window.partitionBy("nationkey").orderBy("date")
    daily
      .withColumn("c", col("rc") - lag("rc", 1).over(wN))
      .filter(col("c").isNotNull)
      .groupBy("nationkey")
      .agg(count(lit(1)).as("n_obs"),
        sort_array(collect_list(col("c"))).as("s"))
      .withColumn("k", expr("(n_obs * 5 + 99) div 100"))
      .withColumn("es95_num_cents",
        expr("aggregate(slice(s, 1, CAST(k AS INT)), 0L, (a, x) -> a + x)"))
      .select(col("nationkey"), col("n_obs"), col("k"),
        expr("element_at(s, CAST(k AS INT))").as("var95_cents"),
        col("es95_num_cents"),
        (col("es95_num_cents").cast("double") / col("k").cast("double"))
          .as("es95"),
        expr("element_at(s, 1)").as("worst_chg"))
      .orderBy("nationkey")
  }

  /** W17 (revenue concentration — Herfindahl-Hirschman index per day):
    * the market-structure lens a risk/ops desk runs beside the
    * cross-sectional stats (w8): per date, each nation's revenue share
    * in exact integer ppm (`rc·10⁶ div total` — floor division, so the
    * shares sum to ≤ 10⁶ with the remainder documented as quantization,
    * the corpus-drift ppm convention) and HHI = Σ share_ppm² — pure
    * BIGINT arithmetic end to end (share ≤ 10⁶ ⇒ square ≤ 10¹², sum
    * over ≤ 25 nations ≪ 2⁶³; at any corpus scale rc·10⁶ stays inside
    * BIGINT for daily revenues under ~9·10¹² cents per nation). The
    * top single share rides along (HHI and max are the two standard
    * concentration readouts).
    *
    * Scale shape: one date-keyed exchange serves the per-date total
    * (window over the ≤25-row nation slice) and the final rollup.
    */
  def w17Concentration(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nationkey"),
        col("o_orderdate").as("date"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rc"))
    val wD = Window.partitionBy("date")
    daily
      .withColumn("tot", sum("rc").over(wD))
      .withColumn("share_ppm", expr("rc * 1000000L div tot"))
      .groupBy("date")
      .agg(count(lit(1)).as("n_nations"),
        sum("rc").as("total_cents"),
        max("share_ppm").as("top_share_ppm"),
        sum(expr("share_ppm * share_ppm")).as("hhi_ppm2"))
      .orderBy("date")
  }

  def w11RollingBeta(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val global = Tables(spark, dir, "orders")
      .groupBy(col("o_orderdate").as("date"))
      .agg(Exact.sumFixed(col("o_totalprice"), 2).as("mkt"))
    val w = Window.partitionBy("nationkey").orderBy("date")
      .rowsBetween(-29, 0)
    nationDailyRevenue(spark, dir)
      .join(global, "date")
      .withColumn("fr",
        collect_list(struct(col("mkt").as("x"), col("rev").as("y"))).over(w))
      .withColumn("n", size(col("fr")).cast("double"))
      // the w7 codegen'd moments loop (syy rides along unused — same
      // expression, one cache of generated code across both queries)
      .withColumn("m", expr("corr_moments5(fr)"))
      .withColumn("sx", col("m.sx"))
      .withColumn("sy", col("m.sy"))
      .withColumn("sxy", col("m.sxy"))
      .withColumn("sxx", col("m.sxx"))
      .withColumn("beta30",
        when(col("n") * col("sxx") - col("sx") * col("sx") <= 0.0, lit(null))
          .otherwise((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx"))))
      .withColumn("alpha30",
        when(col("beta30").isNull, lit(null))
          .otherwise((col("sy") - col("beta30") * col("sx")) / col("n")))
      .select(col("nationkey"), col("date"), col("rev"), col("mkt"),
        col("beta30"), col("alpha30"))
      .orderBy("nationkey", "date")
  }

  /** W8 (cross-sectional factor prep): per DATE, the standard quant
    * factor-conditioning ladder over the nation cross-section — rank,
    * winsorize at the 10% tails, z-score — the transformation every
    * factor library applies to the reference's style-factor panel before
    * regression (behavioral anchor: the style-factor melt family,
    * `wrds_ingestion.py:895-943`).
    *
    * Exactness: rank is row_number under a total order; the winsorize
    * cut points are SELECTION (k = n DIV 10 values trimmed per side —
    * exact integer indexes into the sorted cross-section, no quantile
    * interpolation); clamping is comparison; the z-score's moment sums
    * fold the cross-section in nationkey order (the W7 ordering
    * discipline), and a zero-variance section yields NULL by exact
    * comparison. The moment folds run over the VALUE-SORTED
    * cross-section list (a total order both engines share — an
    * unordered collect would be shuffle-nondeterministic).
    *
    * Scale shape: the corpus pass is the daily rollup; all windows
    * partition by date over the bounded (≤ nations) cross-section.
    */
  def w8CrossSection(spark: SparkSession, dir: String): DataFrame = {
    val wFull = Window.partitionBy("date").orderBy("nationkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRank = Window.partitionBy("date")
      .orderBy(col("rev").desc, col("nationkey").asc)
    nationDailyRevenue(spark, dir)
      .withColumn("xrank", row_number().over(wRank))
      .withColumn("s", sort_array(collect_list(col("rev")).over(wFull)))
      .withColumn("n", size(col("s")))
      .withColumn("k", expr("n DIV 10"))
      .withColumn("lo", expr("element_at(s, CAST(k + 1 AS INT))"))
      .withColumn("hi", expr("element_at(s, CAST(n - k AS INT))"))
      .withColumn("wr", least(greatest(col("rev"), col("lo")), col("hi")))
      // winsorized moments fold the VALUE-sorted cross-section (already
      // materialized for selection — a well-defined order both engines
      // share): clamp it, then two left-to-right sums
      .withColumn("cw", expr(
        "transform(s, x -> least(greatest(x, lo), hi))"))
      .withColumn("sw", expr("aggregate(cw, 0D, (a, x) -> a + x)"))
      .withColumn("sww", expr("aggregate(cw, 0D, (a, x) -> a + x * x)"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("z",
        when(col("nd") * col("sww") - col("sw") * col("sw") <= 0.0, lit(null))
          .otherwise((col("wr") - col("sw") / col("nd")) /
            sqrt((col("nd") * col("sww") - col("sw") * col("sw")) /
              (col("nd") * col("nd")))))
      .select(col("date"), col("nationkey"), col("rev"), col("xrank"),
        col("lo"), col("hi"), col("wr"), col("z"))
      .orderBy("date", "nationkey")
  }

  /** W9 (time-series resample): per-nation weekly OHLC bars from the
    * daily revenue series — the downsampling step every quant stack runs
    * before weekly-frequency models (`df.resample('W').ohlc()` over the
    * reference's daily panel; behavioral anchor: the returns window
    * family, `wrds_ingestion.py:984-996`).
    *
    * Exactness: every bar value is SELECTION (open/close = min_by/max_by
    * on the unique date key, high/low = extrema) or an exact integer-cent
    * sum ([[graft.Exact]]) descaled once — no interpolation, no float
    * accumulation. The week key is pure integer arithmetic — days since
    * Monday 1990-01-01 `div` 7 — with the anchor BEFORE every corpus
    * date on purpose: Spark's `div` truncates toward zero while DuckDB's
    * `//` floors, so a mid-corpus anchor would split the anchor week's
    * negative diffs differently (the sequence/range divergence family).
    *
    * Scale shape: one partial-aggregated daily rollup (corpus read
    * once), then a second bounded aggregate over (nation, week) — both
    * plain groupBys, no window at all.
    */
  def w9ResampleOhlc(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nationkey"), col("o_orderdate").as("date"))
      .agg(sum(Exact.units(col("o_totalprice"), 2)).as("cents"),
        count(lit(1)).as("n_orders"))
    daily
      .withColumn("wk",
        expr("datediff(CAST(date AS DATE), DATE '1990-01-01') div 7"))
      .groupBy("nationkey", "wk")
      .agg(min("date").as("week_start"),
        count(lit(1)).as("n_days"),
        sum("n_orders").as("n_orders"),
        (min_by(col("cents"), col("date")) / lit(100.0)).as("open"),
        (max("cents") / lit(100.0)).as("high"),
        (min("cents") / lit(100.0)).as("low"),
        (max_by(col("cents"), col("date")) / lit(100.0)).as("close"),
        (sum("cents") / lit(100.0)).as("week_rev"))
      .orderBy("nationkey", "wk")
  }

  /** W10 (calendar conform + forward-fill): reindex each nation's daily
    * revenue series onto the full trading calendar and forward-fill the
    * gaps — pandas `reindex(calendar).ffill()`, the step the reference
    * runs before any same-length panel math (behavioral anchor: the
    * trading-calendar alignment family, `wrds_ingestion.py:883-893` /
    * [[graft.Transforms.tradingCalendar]]). Leading gaps (before a
    * nation's first observation) stay NULL — exactly pandas' ffill.
    *
    * Scale shape: the (nation × calendar) grid attaches the BOUNDED
    * calendar as a collected array via an uncorrelated scalar subquery +
    * explode (the simSqInt8 rule — a plain cross join folds to the
    * banned CartesianProduct; the calendar is ~250 rows/year of bounded
    * metadata, never corpus-sized); the fill is one nation-partitioned
    * running `last(ignoreNulls)` window over the bounded daily grid.
    * Both engines fill with the same window text, so values are
    * bit-identical (the revenue is the exact integer-cent sum descaled
    * once).
    */
  def w10FfillCalendar(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders").select(col("o_orderdate").as("date"))
      .distinct().createOrReplaceTempView("graft_w10_cal")
    val nations = Tables(spark, dir, "customer")
      .select(col("c_nationkey").as("nationkey")).distinct()
    val w = Window.partitionBy("nationkey").orderBy("date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nations
      .withColumn("dates", expr("(SELECT collect_list(date) FROM graft_w10_cal)"))
      .select(col("nationkey"), explode(col("dates")).as("date"))
      .join(nationDailyRevenue(spark, dir), Seq("nationkey", "date"), "left")
      .withColumn("rev_ffill", last(col("rev"), ignoreNulls = true).over(w))
      .withColumn("was_gap", col("rev").isNull)
      .select("nationkey", "date", "rev", "rev_ffill", "was_gap")
      .orderBy("nationkey", "date")
  }

  def skewSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    val supp = Tables(spark, dir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    graft.Skew.saltedBroadcastJoin(li, supp, "l_suppkey", 8)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        Exact.sumFixed(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
      .orderBy("s_nationkey")
  }
}
