package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Partitioning.{stableRound6 => sr6}

/** Vectorized portfolio backtests over keyed period-close frames — the
  * capstone consumers of the returns/ranking/tear-sheet primitives.
  */
object Backtest {

  /** CROSS-SECTIONAL MOMENTUM long–short backtest (the Jegadeesh–Titman
    * shape): each period, rank the universe by its `lookback`-period
    * trailing return AS OF THE PRIOR period (signal lagged one period —
    * no look-ahead), go long the top `buckets`-tile and short the
    * bottom, both equal-weighted; the period's spread return is
    * long − short. Emits one row per period: universe size, long/short
    * leg returns, the spread, and its cumulative sum.
    *
    * Determinism: leg returns are cross-member averages (engine-order
    * accumulation → sr6 at emission); the spread is floor-rounded to
    * exact MICRO-UNITS (BIGINT) before compounding, so the cumulative
    * sum is exact integer arithmetic — order-free and bit-identical
    * cross-engine (the q142/q169 micro-quantization trick; a double
    * running sum would inherit DuckDB's segment-tree addition order).
    * Bucket assignment is `ntile` over the TOTAL order
    * (signal desc, key) — tie-safe.
    *
    * Scale shape: the caller collapses ticks to the keys×periods close
    * frame first; per-key windows ride that frame partitioned by key,
    * the ranking window re-partitions it by period, and the final
    * cumulative window runs on the |periods|-row frame (single
    * partition, trivially small). Nothing touches raw ticks.
    */
  /** The signal/bucket frame [[crossSectionalMomentum]] trades on —
    * exposed so membership diagnostics (turnover, leg overlap) read the
    * SAME book the backtest held: per (key, period) the realized
    * period return `__ret`, the lagged momentum signal `__sig`, and the
    * `__b` ∈ [1, buckets] tile over the (signal desc, key) total order.
    * Rows without a tradable signal or realized return are dropped.
    */
  def momentumBuckets(
      df: DataFrame, keyCol: String, timeCol: String, closeCol: String,
      lookback: Int = 5, buckets: Int = 5): DataFrame = {
    require(lookback >= 1 && buckets >= 2,
      s"need lookback >= 1 and buckets >= 2, got $lookback/$buckets")
    val wK = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
    val lag1 = lag(col(closeCol), 1).over(wK)
    val lagN = lag(col(closeCol), lookback).over(wK)
    val enriched = df
      .withColumn("__ret",
        when(lag1 === 0.0, lit(null).cast("double"))
          .otherwise(col(closeCol) / lag1 - 1.0))
      .withColumn("__mom",
        when(lagN === 0.0, lit(null).cast("double"))
          .otherwise(col(closeCol) / lagN - 1.0))
      .withColumn("__sig", lag(col("__mom"), 1).over(wK))
    val base = enriched
      .filter(col("__sig").isNotNull && col("__ret").isNotNull)
    val wD = Window.partitionBy(col(timeCol))
      .orderBy(col("__sig").desc, col(keyCol))
    base.withColumn("__b", ntile(buckets).over(wD))
  }

  def crossSectionalMomentum(
      df: DataFrame, keyCol: String, timeCol: String, closeCol: String,
      lookback: Int = 5, buckets: Int = 5): DataFrame = {
    val perDay = momentumBuckets(df, keyCol, timeCol, closeCol, lookback, buckets)
      .groupBy(col(timeCol))
      .agg(
        count(lit(1)).as("n_universe"),
        avg(when(col("__b") === 1, col("__ret"))).as("__lr"),
        avg(when(col("__b") === buckets, col("__ret"))).as("__sr"))
      .withColumn("__ls_micro",
        when(col("__lr").isNotNull && col("__sr").isNotNull,
          floor((col("__lr") - col("__sr")) * lit(1000000d) + lit(0.5d))
            .cast("long")))
    val wT = Window.orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay.select(
      col(timeCol),
      col("n_universe"),
      sr6(col("__lr") + lit(0.0)).as("long_ret"),
      sr6(col("__sr") + lit(0.0)).as("short_ret"),
      (col("__ls_micro").cast("double") / lit(1000000d)).as("ls_ret"),
      (sum(col("__ls_micro")).over(wT).cast("double") / lit(1000000d))
        .as("cum_ls"))
  }

  /** RANK INFORMATION COEFFICIENT (Spearman IC) of the momentum signal
    * against forward returns, per period and per horizon — the
    * standard signal-evaluation read (does today's ranking predict the
    * next h periods?), with the horizon axis showing signal DECAY.
    * Emits one row per (horizon, period): universe size, the period's
    * IC, and the horizon's mean IC and t-stat (repeated per row).
    *
    * Determinism: both rankings are row_number over TOTAL orders
    * ((signal, key) and (forward return, key)), so each period's rank
    * vectors are exact integer permutations of 1..n and the IC
    * collapses to the classic integer-sum form
    * (n·Σr₁r₂ − (Σr₁)²) / (n·Σr₁² − (Σr₁)²) — ONE division of exact
    * BIGINTs, bit-identical cross-engine with no rounding. Only the
    * cross-period mean/t aggregates accumulate in engine order → sr6.
    *
    * Scale shape: everything rides the keys×periods close frame; per
    * horizon, two ranking windows re-partition it by period and one
    * hash aggregate reduces to the periods-row IC frame; the summary
    * window runs per horizon on that tiny frame.
    */
  def rankInformationCoefficient(
      df: DataFrame, keyCol: String, timeCol: String, closeCol: String,
      lookback: Int = 5, horizons: Seq[Int] = Seq(1, 3, 5)): DataFrame = {
    require(lookback >= 1 && horizons.nonEmpty && horizons.forall(_ >= 1),
      s"need lookback >= 1 and positive horizons, got $lookback/$horizons")
    val wK = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
    val lagN = lag(col(closeCol), lookback).over(wK)
    val base = df.withColumn("__sig",
      when(lagN === 0.0, lit(null).cast("double"))
        .otherwise(col(closeCol) / lagN - 1.0))
    val perHorizon = horizons.map { h =>
      val leadC = lead(col(closeCol), h).over(wK)
      val withF = base.withColumn("__f",
        when(col(closeCol) === 0.0, lit(null).cast("double"))
          .otherwise(leadC / col(closeCol) - 1.0))
        .filter(col("__sig").isNotNull && col("__f").isNotNull)
      val wSig = Window.partitionBy(col(timeCol))
        .orderBy(col("__sig"), col(keyCol))
      val wF = Window.partitionBy(col(timeCol))
        .orderBy(col("__f"), col(keyCol))
      val n = col("n_universe")
      val num = n * col("__s12") - col("__s1") * col("__s1")
      val den = n * col("__sq") - col("__s1") * col("__s1")
      withF
        .withColumn("__r1", row_number().over(wSig).cast("long"))
        .withColumn("__r2", row_number().over(wF).cast("long"))
        .groupBy(col(timeCol))
        .agg(count(lit(1)).as("n_universe"),
          sum(col("__r1") * col("__r2")).as("__s12"),
          sum(col("__r1")).as("__s1"),
          sum(col("__r1") * col("__r1")).as("__sq"))
        .select(lit(h).as("horizon"), col(timeCol), col("n_universe"),
          when(n < 2, lit(null).cast("double"))
            .otherwise(num.cast("double") / den.cast("double")).as("ic"))
    }
    val all = perHorizon.reduce(_ unionByName _)
    val wH = Window.partitionBy(col("horizon"))
    val cnt = count(col("ic")).over(wH)
    val mean = avg(col("ic")).over(wH)
    val sd = stddev_samp(col("ic")).over(wH)
    all
      .withColumn("mean_ic", sr6(mean + lit(0.0)))
      .withColumn("t_ic",
        when(cnt < 2 || sd.isNull || sd.isNaN || sd === 0.0, lit(null).cast("double"))
          .otherwise(sr6(mean / (sd / sqrt(cnt.cast("double"))) + lit(0.0))))
  }

  /** Membership TURNOVER of one leg of the [[momentumBuckets]] book:
    * per period, how much of the leg is NEW — n_long, n_stay (members
    * also held the previous period), churn = 1 − n_stay/n_long. The
    * number that prices the strategy's rebalancing cost; churn is null
    * on the first period (no prior book). All counts are exact
    * integers; the one division is deterministic cross-engine.
    *
    * Scale shape: membership is a filter of the bucket frame; the
    * period index is a dense_rank over the DISTINCT periods (a
    * |periods|-row single-partition window — trivially small); the
    * stay-join is an equi-join of consecutive books on (key, idx).
    */
  def legTurnover(
      df: DataFrame, keyCol: String, timeCol: String, closeCol: String,
      lookback: Int = 5, buckets: Int = 5, leg: Int = 1): DataFrame = {
    require(leg >= 1 && leg <= buckets, s"leg must be in [1, $buckets], got $leg")
    val members = momentumBuckets(df, keyCol, timeCol, closeCol, lookback, buckets)
      .filter(col("__b") === leg)
      .select(col(keyCol), col(timeCol))
    val days = members.select(col(timeCol)).distinct()
      .withColumn("__idx", dense_rank().over(Window.orderBy(col(timeCol))))
    val m = members.join(days, Seq(timeCol))
    val prev = m.select(col(keyCol), (col("__idx") + 1).as("__idx"),
      lit(1L).as("__held"))
    m.join(prev, Seq(keyCol, "__idx"), "left")
      .groupBy(col(timeCol), col("__idx"))
      .agg(count(lit(1)).as("n_long"), sum(col("__held")).as("__stay"))
      .select(
        col(timeCol),
        col("n_long"),
        coalesce(col("__stay"), lit(0L)).as("n_stay"),
        when(col("__idx") === 1, lit(null).cast("double"))
          .otherwise(lit(1.0) - coalesce(col("__stay"), lit(0L)).cast("double")
            / col("n_long").cast("double")).as("churn"))
  }
}
