package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust-statistics preprocessing for training pipelines: outlier
  * clamping (winsorization) and distribution binning — the numeric
  * analogues of the text quality gates in [[TextAnalysis]].
  *
  * Scale shape: winsorization is two aggregates over |groups| rows (the
  * exact percentile needs a per-group sort — at 100 TB swap in
  * `approx_percentile`, same plan shape, t-digest partials) plus a
  * broadcast join of the tiny bounds frame back onto the data; binning is
  * a pure per-row codegen'd floor — no shuffle at all until the final
  * count aggregate.
  */
object Robust {

  /** Per-group winsorization bounds: (group, lo, hi) at the given exact
    * percentiles (linear interpolation — the same contract as DuckDB's
    * `quantile_cont`, verified by q33).
    */
  def winsorBounds(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    df.groupBy(col(groupCol))
      .agg(
        expr(s"percentile($valueCol, $pLo)").as("lo"),
        expr(s"percentile($valueCol, $pHi)").as("hi"))
  }

  /** Clamp `valueCol` into its group's [pLo, pHi] percentile bounds.
    * Adds `<valueCol>_w`; the bounds frame broadcasts (|groups| rows).
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    val bounds = winsorBounds(df, groupCol, valueCol, pLo, pHi)
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("lo")), col("hi")))
      .drop("lo", "hi")
  }

  /** Per-group MEDIAN/MAD robust outlier profile (Iglewicz–Hoaglin
    * modified z-score, public methodology): med = exact median, MAD =
    * median(|v − med|), a row is an outlier when
    * |0.6745·(v − med)/MAD| > `threshold` (3.5 is the standard cut).
    * Mean/stddev z-scores let one fat tail move its own yardstick; the
    * median/MAD pair is 50%-breakdown robust — the numeric gate that
    * actually survives log-spam value columns.
    *
    * Output per group: (group, med, mad, n, n_outliers) — n_outliers
    * NULL when MAD = 0 (≥ half the group is a single value; the
    * modified z is undefined, a disposition, not a zero).
    *
    * Determinism contract: both medians are exact interpolated
    * percentiles (`percentile` ↔ `quantile_cont`, the verified q33/q58
    * contract); the z expression is written in ONE association order —
    * (c·(v−med))/mad — in both engines, and the 0.6745 constant ships
    * string-cast. med/mad floor-round at 1e-6 for display; the outlier
    * comparison uses the UNROUNDED values.
    *
    * Scale shape: two tiny grouped aggregates (each needs a per-group
    * sort for the exact percentile — swap approx_percentile at 100 TB,
    * same plan) + two broadcast joins of |groups|-row frames + one
    * final count aggregate. The data shuffles only for its own
    * group-by; with pre-partitioned input even that collapses.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      threshold: Double = 3.5): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    val withMed = df.join(broadcast(med), Seq(groupCol))
    val mad = withMed.groupBy(col(groupCol))
      .agg(expr(s"percentile(abs($valueCol - __med), 0.5)").as("__mad"))
    val z = abs(lit(0.6745) * (col(valueCol) - col("__med")) / col("__mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        graft.util.Partitioning.stableRound6(max(col("__med"))).as("med"),
        graft.util.Partitioning.stableRound6(max(col("__mad"))).as("mad"),
        count(lit(1)).as("n"),
        when(max(col("__mad")) === 0.0, lit(null).cast("long"))
          .otherwise(sum((z > threshold).cast("long"))).as("n_outliers"))
  }

  /** Equi-width histogram: assign each row to `floor(value / width)` and
    * count per (group, bin). Pure arithmetic binning — portable, and the
    * only shuffle is the final (group, bin) count.
    */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
      width: Double): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    df.withColumn("bin", floor(col(valueCol) / lit(width)).cast("long"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n"))
  }
}
