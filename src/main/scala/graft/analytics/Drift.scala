package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring — the ML-ops guardrail between a served
  * feature store (SURVEY §2.4's aggregates) and the models trained on
  * it: has this feature's distribution moved since the reference period?
  */
object Drift {

  /** Population Stability Index per key: fixed-width bins are fitted on
    * the REFERENCE slice (`isCurrent` false), both slices are histogrammed
    * into them (out-of-range current values clamp into the edge bins —
    * drift INTO the tails must register, not vanish), and
    *
    *   PSI = Σ_bins (p_i − q_i)·ln(p_i / q_i)
    *
    * with Laplace smoothing p_i = (c_i + 1)/(N + bins) so an empty bin
    * contributes a finite term instead of ±∞. Standard reading: <0.1
    * stable, 0.1–0.25 drifting, >0.25 shifted. Keys with no reference
    * rows are absent (there is nothing to be stable against); a
    * zero-width reference (constant feature) degenerates to one bin.
    *
    * Null handling, pinned CONSISTENTLY across the fit and the counts
    * (fitting bounds on one population and histogramming another is
    * silently wrong drift, the failure this operator exists to catch):
    * a null `isCurrent` flag reads as reference (`coalesce(…, false)`)
    * in BOTH places, and rows with a null feature value are excluded
    * from both slices entirely (they have no bin; n_ref/n_cur count
    * binned rows only).
    *
    * Determinism contract: bin ids are one subtract/multiply/divide/floor
    * over the identical parquet doubles (stated identically in the
    * oracle); the PSI sum runs over exactly `bins` smoothed terms and is
    * pinned with the sr6 floor.
    *
    * Scale shape: one aggregate over the reference for per-key bounds
    * (broadcast back), one hash aggregate to (key, bin, period) counts,
    * a bins-sized spine join so empty bins smooth correctly, and window
    * totals over the tiny (key × bins) frame. The data is scanned once
    * per slice and never shuffled beyond the count aggregate.
    *
    * Caller-frame audit (r13 sweep): the reference slice enters as a
    * Column FLAG, not a frame — the broadcast `bounds` side is derived
    * in-plan by `groupBy(key)` and is therefore unique per key by
    * construction; no duplicate-key hazard exists to guard.
    */
  def populationStabilityIndex(
      df: DataFrame, keyCol: String, valueCol: String, isCurrent: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val v = col(valueCol).cast("double")
    val cur = coalesce(isCurrent, lit(false))
    val rows = df.filter(v.isNotNull)
    val bounds = rows.filter(!cur)
      .groupBy(col(keyCol))
      .agg(min(v).as("__mn"), max(v).as("__mx"))
    val bin = when(col("__mx") === col("__mn"), lit(0))
      .otherwise(greatest(
        least(floor((v - col("__mn")) * bins / (col("__mx") - col("__mn"))),
          lit((bins - 1).toDouble)),
        lit(0.0)).cast("int"))
    val counts = rows
      .join(broadcast(bounds), Seq(keyCol))
      .select(col(keyCol), bin.as("__bin"), cur.as("__cur"))
      .groupBy(col(keyCol), col("__bin"))
      .agg(
        sum(when(col("__cur"), 0L).otherwise(1L)).as("__rc"),
        sum(when(col("__cur"), 1L).otherwise(0L)).as("__cc"))
    val spine = bounds.select(col(keyCol))
      .crossJoin(df.sparkSession.range(bins).select(col("id").cast("int").as("__bin")))
    val perKey = Window.partitionBy(col(keyCol))
    val filled = spine.join(counts, Seq(keyCol, "__bin"), "left")
      .select(col(keyCol), col("__bin"),
        coalesce(col("__rc"), lit(0L)).as("__rc"),
        coalesce(col("__cc"), lit(0L)).as("__cc"))
      .withColumn("__rn", sum(col("__rc")).over(perKey))
      .withColumn("__cn", sum(col("__cc")).over(perKey))
    val p = (col("__rc") + 1L).cast("double") / (col("__rn") + bins).cast("double")
    val q = (col("__cc") + 1L).cast("double") / (col("__cn") + bins).cast("double")
    filled
      .groupBy(col(keyCol))
      .agg(
        max(col("__rn")).as("n_ref"),
        max(col("__cn")).as("n_cur"),
        graft.util.Partitioning.stableRound6(sum((p - q) * log(p / q))).as("psi"))
  }

  /** Exact two-sample KOLMOGOROV–SMIRNOV statistic per key — the
    * nonparametric companion to [[populationStabilityIndex]]: where PSI
    * bins (and so depends on a bin count), KS compares the two empirical
    * CDFs at every DISTINCT observed value and reports the supremum gap
    * D = sup_v |F_ref(v) − F_cur(v)|, plus the classical large-sample
    * rejection read at `alpha`: drifted ⇔ D > c(α)·√((n₁+n₂)/(n₁·n₂)),
    * c(α) = √(−ln(α/2)/2).
    *
    * Evaluating at distinct values (grouping first) rather than per row
    * makes tie handling exact — both ECDFs jump by their full tied mass
    * before the comparison — and removes any intra-value ordering
    * dependence. Null flag reads as reference, null values are excluded
    * (the PSI contract); keys missing either sample are absent from the
    * output (nothing to compare — the PSI missing-reference contract).
    *
    * Determinism: the running counts are exact integer sums; each ECDF
    * value is ONE correctly-rounded division, the gap one subtraction —
    * bit-identical cross-engine, so the drifted comparison runs on raw
    * doubles and c(α) ships to the oracle as a string-cast literal.
    * The ratio under the root casts to double BEFORE multiplying
    * (n₁·n₂ as integers would overflow at ~10¹⁰-row samples).
    *
    * Scale shape: one (key, value) hash aggregate collapses the corpus
    * to distinct values, one per-key sort window over those, one final
    * aggregate. The sort is per-key and distributed; nothing global.
    */
  /** c(α) = √(−ln(α/2)/2) — the classical KS rejection constant, shared
    * with the oracle via the string-cast parse (q103's portability
    * pattern for non-dyadic constants).
    */
  def ksCriticalC(alpha: Double): Double = math.sqrt(-math.log(alpha / 2.0) / 2.0)

  def ksTwoSample(
      df: DataFrame, keyCol: String, valueCol: String, isCurrent: Column,
      alpha: Double = 0.05): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    val v = col(valueCol).cast("double")
    val cur = coalesce(isCurrent, lit(false))
    val counts = df.filter(v.isNotNull)
      .groupBy(col(keyCol), v.as("__v"))
      .agg(
        sum(when(cur, 0L).otherwise(1L)).as("__rc"),
        sum(when(cur, 1L).otherwise(0L)).as("__cc"))
    val perKey = Window.partitionBy(col(keyCol))
    val running = perKey.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val gap = abs(
      sum(col("__rc")).over(running).cast("double") / col("__rn").cast("double") -
      sum(col("__cc")).over(running).cast("double") / col("__cn").cast("double"))
    val cAlpha = ksCriticalC(alpha)
    counts
      .withColumn("__rn", sum(col("__rc")).over(perKey))
      .withColumn("__cn", sum(col("__cc")).over(perKey))
      .filter(col("__rn") > 0 && col("__cn") > 0)
      .withColumn("__gap", gap)
      .groupBy(col(keyCol))
      .agg(
        max(col("__rn")).as("n_ref"),
        max(col("__cn")).as("n_cur"),
        max(col("__gap")).as("__d"))
      .withColumn("__crit", lit(cAlpha) * sqrt(
        (col("n_ref").cast("double") + col("n_cur").cast("double")) /
        (col("n_ref").cast("double") * col("n_cur").cast("double"))))
      .withColumn("ks_d", graft.util.Partitioning.stableRound6(col("__d")))
      .withColumn("crit", graft.util.Partitioning.stableRound6(col("__crit")))
      .withColumn("drifted", col("__d") > col("__crit"))
      .drop("__d", "__crit")
  }
}
