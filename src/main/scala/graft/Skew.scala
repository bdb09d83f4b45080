package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §7.4.3: interval joins and hot
  * keys at the 100 TB scale).
  *
  * First line of defense is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); salting is for
  * the cases AQE can't fix — skewed *aggregations* and skewed *broadcast
  * build sides* — by spreading one hot key over `factor` synthetic
  * sub-keys.
  */
object Skew {

  /** Two-phase salted aggregation: `groupBy(key, salt).agg(partials)` then
    * `groupBy(key).agg(merge)`. Correct for any commutative+associative
    * aggregate expressed as (partial, merge) column pairs; the hot key's
    * rows spread over `factor` reducers in phase 1.
    *
    * Example: saltedSum(df, Seq("k"), col("v"), 32) ==
    * df.groupBy("k").sum("v") with the hot-key shuffle fanned out.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column,
      factor: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(factor)))
    salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(value).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("sum"))
  }

  /** Salted SHUFFLE join for hot low-cardinality keys where NEITHER side
    * fits a broadcast (the J5/J11 interval-join shape: per-entity frames
    * meeting on a ~25-value nation key, so at 100 TB every key is a hot
    * key and AQE's skew splitting cannot split a single in-flight
    * many-to-many key block finer than its join group). The left side
    * derives a DETERMINISTIC salt from `saltExpr` (an entity id — never
    * RNG, so plans replay identically), the right side replicates
    * `factor` ways, and the equi-join runs on `keys :+ __salt`: each hot
    * key's pair block spreads over `factor` reducers while the row
    * multiset stays exactly the plain join's (every left row holds ONE
    * salt; the right copy with that salt supplies every original match).
    * The right side's shuffle grows by `factor` — the classic trade, so
    * size factor to the reducer imbalance, not higher.
    */
  def saltedShuffleJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltExpr: Column, factor: Int): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1 " +
      "(0 would hit the descending-sequence replicate trap)")
    // NULL salt would never equi-join and silently DROP left rows —
    // breaking the row-multiset contract. Null entity ids land in salt 0
    // and keep every original match.
    val sl = left.withColumn("__salt",
      pmod(coalesce(saltExpr, lit(0L)), lit(factor.toLong)))
    val sr = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    sl.join(sr, keys :+ "__salt").drop("__salt")
  }

  /** Salted join of a skewed fact against a small dimension: the fact side
    * gets a random-ish salt in [0, factor); the dimension is exploded
    * `factor` times so every (key, salt) pair still matches. The
    * dimension must be broadcast-sized (it grows by `factor`).
    */
  def saltedBroadcastJoin(fact: DataFrame, dim: DataFrame, key: String,
      factor: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(factor.toLong)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    saltedFact.join(broadcast(explodedDim), Seq(key, "__salt"))
      .drop("__salt")
  }
}
