package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (100 TB mandate: a single key with 10^9
  * rows must not serialize one reducer).
  *
  * Standard levers, composable with AQE's runtime skew-join splitting
  * (which stays on — these are for the cases AQE can't fix: skewed
  * aggregations, and joins where AQE can't split because the matching
  * build side can't be replicated per split).
  */
object Skew {

  /** One algebraic aggregate in a salted two-phase plan: `partial` runs per
    * (key, salt); `merge` recombines the partials per key. Only algebraic
    * aggregates compose (sum/count/min/max; avg = sum+count then divide).
    */
  final case class SaltedAgg(name: String, partial: Column, merge: Column => Column)

  object SaltedAgg {
    def sumOf(c: Column, name: String): SaltedAgg = SaltedAgg(name, sum(c), sum)
    def countAll(name: String): SaltedAgg = SaltedAgg(name, count(lit(1)), sum)
    def minOf(c: Column, name: String): SaltedAgg = SaltedAgg(name, min(c), min)
    def maxOf(c: Column, name: String): SaltedAgg = SaltedAgg(name, max(c), max)
  }

  /** Two-phase salted aggregation: groupBy (key, salt) partials, then
    * re-aggregate by key. The hot key's rows spread over `saltBuckets`
    * reducers in phase 1; phase 2 touches only |keys| * saltBuckets
    * pre-aggregated rows.
    */
  def saltedAggregate(
      df: DataFrame, keys: Seq[Column], saltBuckets: Int,
      aggs: Seq[SaltedAgg]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(aggs.head.partial.as(aggs.head.name),
        aggs.tail.map(a => a.partial.as(a.name)): _*)
    phase1
      .groupBy(keys: _*)
      .agg(aggs.head.merge(col(aggs.head.name)).as(aggs.head.name),
        aggs.tail.map(a => a.merge(col(a.name)).as(a.name)): _*)
  }

  /** Salted (replicated) join for a skewed LEFT side against a
    * moderate-size right side: left rows get a deterministic pseudo-random
    * salt in [0, saltBuckets); the right side is replicated saltBuckets
    * times so every (key, salt) pair finds its match. The hot key's rows
    * land on saltBuckets different reducers.
    *
    * Right-side replication multiplies |right| by saltBuckets — use when
    * right is far smaller than the skewed left; for a large right side,
    * isolate the hot keys first ([[splitHotKeys]]) and salt only that
    * slice.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String, saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    // right-preserving joins would emit unmatched right rows once per
    // replicated salt bucket — wrong duplicates by construction
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports left-preserving join types only, got: $joinType")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(col(key), spark_partition_id(), monotonically_increasing_id()), lit(saltBuckets)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Hot-key isolation: split `df` into (hot, rest) by a driver-side list
    * of known heavy hitters (e.g. from a prior approx top-k pass) so the
    * two slices can take different plans (broadcast/salt for hot, plain
    * shuffle for the rest).
    */
  def splitHotKeys(df: DataFrame, key: String, hotKeys: Seq[Any]): (DataFrame, DataFrame) =
    (df.filter(col(key).isin(hotKeys: _*)), df.filter(!col(key).isin(hotKeys: _*)))
}
