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
}
