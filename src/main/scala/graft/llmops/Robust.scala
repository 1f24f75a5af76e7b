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
