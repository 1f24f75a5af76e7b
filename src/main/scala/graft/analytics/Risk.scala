package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Partitioning.{stableRound6 => sr6}

/** Tail-risk measures over keyed series — the historical-simulation
  * numbers a risk desk reads every morning.
  */
object Risk {

  /** Historical VALUE-AT-RISK and EXPECTED SHORTFALL per series, from
    * the empirical distribution of 1-step changes: VaR(α) is the exact
    * interpolated α-quantile of the changes (a LOSS reads negative —
    * the sign convention is the raw quantile, not flipped), and
    * ES(α) = mean of changes at or below VaR — the coherent tail mean
    * that answers "how bad is bad". `n_tail` counts the averaged
    * observations.
    *
    * Determinism: the quantile is the exact interpolated percentile
    * (Spark `percentile` == DuckDB `quantile_cont`, the q33/q58/q165
    * contract) over exact 1-step differences; the tail membership
    * comparison `r <= VaR` therefore runs on identical doubles, and
    * only the final mean rounds (sr6, −0.0-proofed).
    *
    * Scale shape: one per-key sort for the diffs, one keyed percentile
    * aggregate, one keyed join back (AQE broadcasts the |keys|-row
    * side), one conditional mean. Nothing global.
    */
  def historicalVaR(
      df: DataFrame, valueCol: String, partition: Seq[String],
      order: Seq[String], alpha: Double = 0.05): DataFrame = {
    require(alpha > 0 && alpha < 0.5, s"alpha in (0, 0.5), got $alpha")
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
    val diffs = df
      .withColumn("__r", col(valueCol) - lag(col(valueCol), 1).over(w))
      .filter(col("__r").isNotNull)
    val varq = diffs.groupBy(partition.map(col): _*)
      .agg(percentile(col("__r"), lit(alpha)).as("__var"))
    diffs.join(varq, partition)
      .groupBy(partition.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sr6(max(col("__var")) + lit(0.0)).as("var_a"),
        count(when(col("__r") <= col("__var"), lit(1))).as("n_tail"),
        sr6(avg(when(col("__r") <= col("__var"), col("__r"))) + lit(0.0))
          .as("es_a"))
  }

  /** Performance TEAR SHEET per series from a keyed period-close frame:
    * annualized return/volatility, Sharpe, Sortino (downside
    * deviation), maximum drawdown, and Calmar — the summary a
    * portfolio report opens with. Returns are simple 1-period
    * (`close/lag(close) − 1`, zero-denominator → null, the q182
    * guard); drawdown is `close/runningMax − 1` on exact closes.
    *
    * Determinism: closes and the drawdown chain are exact doubles
    * (division + comparison, identical both engines); the moment
    * aggregates (`avg`/`stddev_samp`/`sum` of squares) accumulate in
    * engine-specific order, so every emitted value rounds through sr6
    * and every ratio is built from the UNROUNDED moments in one
    * expression, mirrored verbatim in the oracle. `stddev_samp` needs
    * n ≥ 2 (Spark yields NaN, DuckDB NULL — guarded to null in both);
    * Sortino guards the all-gains zero-downside case; Calmar requires
    * a strictly negative max drawdown.
    *
    * Scale shape: the caller collapses the tick stream to the
    * |keys|×|periods| close frame FIRST (one hash aggregate); both
    * windows (lag, running max) and the final aggregate ride that tiny
    * frame — nothing here ever re-shuffles raw ticks.
    */
  def performanceSummary(
      df: DataFrame, closeCol: String, partition: Seq[String],
      order: Seq[String], periodsPerYear: Double = 252.0): DataFrame = {
    require(periodsPerYear > 0, s"periodsPerYear > 0, got $periodsPerYear")
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
    val lagC = lag(col(closeCol), 1).over(w)
    val runMax = max(col(closeCol))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val enriched = df
      .withColumn("__ret",
        when(lagC === 0.0, lit(null).cast("double"))
          .otherwise(col(closeCol) / lagC - 1.0))
      .withColumn("__dd",
        when(runMax === 0.0, lit(null).cast("double"))
          .otherwise(col(closeCol) / runMax - 1.0))
    val py = lit(periodsPerYear)
    val nR = count(col("__ret"))
    val mu = avg(col("__ret"))
    val sd = stddev_samp(col("__ret"))
    val downLoss = least(col("__ret"), lit(0.0))
    val downSq = sum(downLoss * downLoss)
    val dnDev = sqrt(downSq / (nR - lit(1L)).cast("double"))
    val minDd = min(col("__dd"))
    enriched.groupBy(partition.map(col): _*)
      .agg(
        count(lit(1)).as("n_periods"),
        nR.as("n_rets"),
        sr6(mu * py + lit(0.0)).as("ann_ret"),
        when(nR < 2, lit(null).cast("double"))
          .otherwise(sr6(sd * sqrt(py) + lit(0.0))).as("ann_vol"),
        when(nR < 2 || sd === 0.0, lit(null).cast("double"))
          .otherwise(sr6(mu * py / (sd * sqrt(py)) + lit(0.0))).as("sharpe"),
        when(nR < 2 || downSq === 0.0, lit(null).cast("double"))
          .otherwise(sr6(mu * py / (dnDev * sqrt(py)) + lit(0.0))).as("sortino"),
        sr6(minDd + lit(0.0)).as("max_drawdown"),
        when(minDd < 0.0, sr6(mu * py / -minDd + lit(0.0)))
          .otherwise(lit(null).cast("double")).as("calmar"))
  }
}
