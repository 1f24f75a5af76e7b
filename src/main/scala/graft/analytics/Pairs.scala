package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Partitioning.{stableRound6 => sr6}

/** Pairs-trading screens over keyed period-close frames: which pairs of
  * series move together, and how fast their spread mean-reverts.
  */
object Pairs {

  /** Engle–Granger-style COINTEGRATION screen over every key pair: OLS
    * hedge fit y = α + βx on the time-aligned closes, then the AR(1)
    * coefficient of the residual spread and its mean-reversion
    * HALF-LIFE −ln2/ln(ρ) — the number a pairs desk ranks candidates
    * by. Emits one row per unordered pair (k1 < k2): n_periods, beta,
    * alpha, rho, half_life.
    *
    * Determinism: β and α round (sr6) BEFORE the spread pass, so the
    * per-row spread arithmetic runs on identical doubles in both
    * engines; ρ is covar/var over those spreads (engine-order moment
    * accumulation → sr6 at emission), and the half-life transform runs
    * on the unrounded ρ with −ln2 shipped as the string-cast JVM
    * double. Guards: n < 2 or a constant x side → null β (and a null
    * spread chain); ρ is null on a degenerate lagged-spread variance;
    * half-life only for ρ ∈ (0, 1) — ρ ≥ 1 means no reversion, ρ ≤ 0
    * oscillates faster than the sampling period resolves.
    *
    * Scale shape: the caller collapses ticks to the keys×periods close
    * frame FIRST; the pair cross is an equi-join of that tiny frame on
    * the period (|keys|² pairs × |periods| rows — with hundreds of
    * keys this is still millions, not billions, and never touches raw
    * ticks). At thousands of keys, block the pair universe first
    * (sector/cluster buckets — the X2 banding idea) and feed each
    * block through this same screen; the operator itself does not
    * enumerate pairs beyond its input cross.
    */
  def cointegrationScreen(
      df: DataFrame, keyCol: String, timeCol: String,
      closeCol: String): DataFrame = {
    val a = df.select(col(keyCol).as("k1"), col(timeCol).as("__t"),
      col(closeCol).cast("double").as("__x"))
    val b = df.select(col(keyCol).as("k2"), col(timeCol).as("__t"),
      col(closeCol).cast("double").as("__y"))
    val pairs = a.join(b, Seq("__t")).filter(col("k1") < col("k2"))

    val fit = pairs.groupBy(col("k1"), col("k2"))
      .agg(
        count(lit(1)).as("n_periods"),
        covar_samp(col("__y"), col("__x")).as("__cxy"),
        var_samp(col("__x")).as("__vx"),
        avg(col("__x")).as("__mx"),
        avg(col("__y")).as("__my"))
      .withColumn("beta",
        when(col("n_periods") < 2 || col("__vx") === 0.0, lit(null).cast("double"))
          .otherwise(sr6(col("__cxy") / col("__vx") + lit(0.0))))
      .withColumn("alpha",
        sr6(col("__my") - col("beta") * col("__mx") + lit(0.0)))
      .select("k1", "k2", "n_periods", "beta", "alpha")

    val sp = pairs.join(fit, Seq("k1", "k2"))
      .withColumn("__s", col("__y") - (col("alpha") + col("beta") * col("__x")))
    val w = Window.partitionBy(col("k1"), col("k2")).orderBy(col("__t"))
    val rho = sp
      .withColumn("__sl", lag(col("__s"), 1).over(w))
      .groupBy(col("k1"), col("k2"))
      .agg(covar_samp(col("__s"), col("__sl")).as("__c"),
        var_samp(col("__sl")).as("__v"))
      .withColumn("__rho",
        when(col("__v").isNull || col("__v") === 0.0, lit(null).cast("double"))
          .otherwise(col("__c") / col("__v")))
      .select("k1", "k2", "__rho")

    fit.join(rho, Seq("k1", "k2"))
      .select(
        col("k1"), col("k2"), col("n_periods"), col("beta"), col("alpha"),
        when(col("__rho").isNull, lit(null).cast("double"))
          .otherwise(sr6(col("__rho") + lit(0.0))).as("rho"),
        when(col("__rho") > 0.0 && col("__rho") < 1.0,
          sr6(lit(-math.log(2.0)) / log(col("__rho")) + lit(0.0)))
          .otherwise(lit(null).cast("double")).as("half_life"))
  }
}
