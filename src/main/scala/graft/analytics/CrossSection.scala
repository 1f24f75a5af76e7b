package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Partitioning.{stableRound6 => sr6}

/** Cross-sectional (per-period, across-entity) feature preparation — the
  * standard factor-model preprocessing step: within each period,
  * winsorize the raw signal at quantile fences, then z-score against the
  * period's winsorized mean/stddev and attach a percentile rank. Every
  * quant factor pipeline runs this exact shape (rank/zscore within
  * rebalance date) before neutralization or portfolio sort.
  *
  * Scale shape: two tiny per-period aggregates (quantile fences, then
  * moments of the clamped values) broadcast back onto the row frame —
  * the corpus itself shuffles ONCE, for the percentile-rank window's
  * per-period sort. Periods are few relative to rows, so both joins take
  * the AQE broadcast path; nothing global, no driver collects.
  *
  * Determinism: exact interpolated percentiles (Spark `percentile` ==
  * DuckDB `quantile_cont`, the q33/q58/q165 contract), sample stddev
  * with a zero/NaN guard, `percent_rank` over a (value, id) total order
  * so ties never leave rank to partition luck, and the z crosses zero so
  * it ships through the −0.0-proof `sr6(x + 0.0)` form.
  */
object CrossSection {

  /** Winsorized z-score + percentile rank of `valueCol` within each
    * `periodCol` group. Output adds `z` (null when the period's clamped
    * stddev is 0/undefined — a one-entity or constant period has no
    * cross-section) and `pct_rank` ∈ [0, 1] (0 for a single-row period,
    * the SQL percent_rank convention).
    */
  def standardize(
      df: DataFrame, periodCol: String, idCol: String, valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad fences ($pLo, $pHi)")
    val fences = df.groupBy(col(periodCol))
      .agg(
        percentile(col(valueCol), lit(pLo)).as("__lo"),
        percentile(col(valueCol), lit(pHi)).as("__hi"))
    val clamped = df.join(broadcast(fences), Seq(periodCol))
      .withColumn("__wv",
        when(col(valueCol) < col("__lo"), col("__lo"))
          .when(col(valueCol) > col("__hi"), col("__hi"))
          .otherwise(col(valueCol)))
    val moments = clamped.groupBy(col(periodCol))
      .agg(avg(col("__wv")).as("__mu"), stddev_samp(col("__wv")).as("__sd"))
    val w = Window.partitionBy(col(periodCol))
      .orderBy(col(valueCol), col(idCol))
    clamped.join(broadcast(moments), Seq(periodCol))
      .withColumn("z",
        when(col("__sd").isNull || col("__sd").isNaN || col("__sd") === 0.0,
          lit(null).cast("double"))
          .otherwise(sr6((col("__wv") - col("__mu")) / col("__sd") + lit(0.0))))
      .withColumn("pct_rank", sr6(percent_rank().over(w)))
      .drop("__lo", "__hi", "__wv", "__mu", "__sd")
  }
}
