package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Partitioning.{stableRound6 => sr6}

/** Market-microstructure estimators (public methodology: Easley, López
  * de Prado & O'Hara 2012 for VPIN; Kyle 1985 for price-impact lambda;
  * Roll 1984 for the implicit-spread estimator). Everything is windows
  * and aggregates over a keyed tick series — no recurrence, so unlike
  * the [[graft.streaming.StatefulOps]] bar family these are fully
  * frame-expressible and their oracles are plain window SQL.
  */
object Microstructure {

  /** The TICK-RULE sign as a window column: +1 on an uptick, −1 on a
    * downtick, the previous NON-ZERO-change sign carried on a zero
    * change (the classic convention). The carry is `last(_, ignoreNulls)`
    * over the unbounded-preceding frame — a gap-fill, not a recurrence,
    * which is why the whole suite stays in window algebra. Rows before
    * the first price change sign as 0 (unclassifiable).
    */
  private def tickSign(priceCol: String, w: org.apache.spark.sql.expressions.WindowSpec,
      runningW: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val d = col(priceCol) - lag(col(priceCol), 1).over(w)
    val raw = when(d > 0, lit(1)).when(d < 0, lit(-1)) // null: zero change / first row
    coalesce(last(raw, ignoreNulls = true).over(runningW), lit(0))
  }

  /** The tick-rule sign as a PUBLIC column on the frame — +1 uptick,
    * −1 downtick, previous non-zero-change sign carried, 0 before the
    * first change. Exposed so the sign series composes with the other
    * series operators (order-flow persistence = [[graft.analytics.Indicators.autocorrelation]]
    * over this column); shares the same (key, order) sort as any window
    * stage stacked on top.
    */
  def tickSigns(
      df: DataFrame, keyCols: Seq[String], order: Seq[String],
      priceCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order.map(col): _*)
    val runningW = w.rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("sgn", tickSign(priceCol, w, runningW))
  }

  /** VPIN over fixed-tick-count buckets: per bucket the absolute net
    * tick-rule imbalance over the bucket size, and the ROLLING form —
    * Σ|net| / Σn over the trailing `window` buckets (the literature's
    * volume-synchronized average; a ratio of exact integer sums, so the
    * only float op is the final division). With a volume column the
    * same construction runs on q148's micro-quantized integer volumes;
    * the tick-count form is the volume ≡ 1 special case and keeps the
    * whole pipeline in exact arithmetic.
    *
    * Output per (key, bucket): n_ticks, net, vpin, vpin_roll (sr6).
    *
    * Scale shape: one (key, order) sort shared by the sign/bucket
    * windows, one (key, bucket) hash agg, one tiny window over the
    * bucket frame. The final partial bucket is emitted with its own n
    * (documented; the oracle mirrors it).
    */
  def vpin(
      df: DataFrame, keyCol: String, order: Seq[String], priceCol: String,
      bucketTicks: Int, window: Int): DataFrame = {
    require(bucketTicks >= 1, s"bucketTicks must be >= 1, got $bucketTicks")
    require(window >= 1, s"window must be >= 1, got $window")
    val w = Window.partitionBy(col(keyCol)).orderBy(order.map(col): _*)
    val runningW = w.rowsBetween(Window.unboundedPreceding, 0)
    val signed = df
      .withColumn("__sgn", tickSign(priceCol, w, runningW))
      .withColumn("__bucket", ((row_number().over(w) - 1) / bucketTicks).cast("long"))
    val buckets = signed.groupBy(col(keyCol), col("__bucket").as("bucket"))
      .agg(count(lit(1)).as("n_ticks"), sum(col("__sgn")).cast("long").as("net"))
    val bw = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(-(window - 1), 0)
    buckets
      .withColumn("vpin", sr6(abs(col("net")).cast("double") / col("n_ticks").cast("double")))
      .withColumn("vpin_roll",
        sr6(sum(abs(col("net"))).over(bw).cast("double") /
          sum(col("n_ticks")).over(bw).cast("double")))
  }

  /** Per-(key, day)-style group microstructure aggregates over a tick
    * series:
    *
    *   - Kyle's lambda: slope of Δp on the signed flow proxy
    *     (tick sign × price magnitude) — covar_samp / var_samp, null
    *     when the flow has no variance.
    *   - Roll's implicit spread: 2·√(−cov(Δp_t, Δp_{t−1})) — null when
    *     the serial covariance is non-negative (the estimator is
    *     undefined there, a standard disposition).
    *
    * Δp and the lagged Δp are computed within the GROUP's window (no
    * cross-group leakage), then one hash aggregate per group; both
    * ratios guard their zero denominators in the projection, not under
    * the aggregate (the ANSI window trap). All outputs sr6.
    */
  def kyleRoll(
      df: DataFrame, groupCols: Seq[String], order: Seq[String],
      priceCol: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order.map(col): _*)
    val runningW = w.rowsBetween(Window.unboundedPreceding, 0)
    val prepared = df
      .withColumn("__d", col(priceCol) - lag(col(priceCol), 1).over(w))
      .withColumn("__dprev", lag(col("__d"), 1).over(w))
      .withColumn("__sv", tickSign(priceCol, w, runningW) * col(priceCol))
    prepared.groupBy(groupCols.map(col): _*)
      .agg(
        count(col("__d")).as("n_changes"),
        covar_samp(col("__d"), col("__sv")).as("__cds"),
        var_samp(col("__sv")).as("__vs"),
        covar_samp(col("__d"), col("__dprev")).as("__c1"))
      .withColumn("kyle_lambda",
        when(col("__vs").isNull || col("__vs") === 0.0, lit(null).cast("double"))
          .otherwise(sr6(col("__cds") / col("__vs"))))
      .withColumn("roll_spread",
        when(col("__c1") < 0, sr6(lit(2.0) * sqrt(-col("__c1"))))
          .otherwise(lit(null).cast("double")))
      .drop("__cds", "__vs", "__c1")
  }

  /** Amihud (2002) illiquidity over a day-level frame: per (key, day)
    * the price-impact-per-traded-unit read |ret_d| / volume_d, plus its
    * trailing `rollDays`-day mean (the paper's ILLIQ average). The
    * day frame is built here from intraday bars in ONE hash aggregate
    * (close = last print by the order column, volume = Σ), then the
    * return and the rolling mean ride one tiny per-key window over
    * DAYS — at any corpus size the windowed frame is |keys|×|days|,
    * never the tick count.
    *
    * Nulls: the first day of a key has no previous close (ret null);
    * a zero/absent-volume day has no impact-per-unit reading (illiq
    * null); null illiq days drop out of the rolling mean (avg skips
    * nulls — the literature's convention of averaging over valid days).
    */
  def amihud(
      bars: DataFrame, keyCols: Seq[String], dayCol: String,
      orderCol: String, closeCol: String, volumeCol: String,
      rollDays: Int): DataFrame = {
    val daily = bars.groupBy((keyCols :+ dayCol).map(col): _*)
      .agg(
        max_by(col(closeCol), col(orderCol)).as("__cl"),
        sum(col(volumeCol)).as("volume"),
        count(lit(1)).as("n_bars"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(dayCol))
    val ret = col("__cl") / lag(col("__cl"), 1).over(w) - 1.0
    val withRet = daily.withColumn("__ret", ret)
      .withColumn("__illiq",
        when(col("__ret").isNull || col("volume").isNull || col("volume") <= 0.0,
          lit(null).cast("double"))
          .otherwise(abs(col("__ret")) / col("volume")))
    withRet
      .withColumn("ret", sr6(col("__ret") + lit(0.0)))
      .withColumn("illiq", sr6(col("__illiq") * lit(1.0e6)))
      .withColumn("illiq_roll",
        sr6(avg(col("__illiq") * lit(1.0e6))
          .over(w.rowsBetween(-(rollDays - 1), 0))))
      .drop("__cl", "__ret", "__illiq")
  }

  /** 3 − 2√2, the Corwin–Schultz denominator — driver-computed once,
    * string-cast portable to the oracle (the q103/q157 pattern).
    */
  val CorwinSchultzK: Double = 3.0 - 2.0 * math.sqrt(2.0)

  /** Corwin–Schultz (2012) HIGH-LOW spread estimator per (key, period):
    * the bid-ask spread backed out of two consecutive periods' ranges —
    * the true range carries over both periods while the spread is paid
    * in each, so
    *
    *   β = ln(H₁/L₁)² + ln(H₂/L₂)²   (sum over the 2-period window)
    *   γ = ln(max(H)/min(L))²         (the 2-period range)
    *   α = (√(2β) − √β)/(3−2√2) − √(γ/(3−2√2))
    *   S = 2(e^α − 1)/(1 + e^α)
    *
    * Complements [[kyleRoll]]'s serial-covariance spread: CS needs only
    * (H, L) per period — it works on bars where tick-level Δp is gone.
    * Output: `spread_raw` (sr6, −0.0-proofed) and the conventional
    * floored `spread` = max(0, raw) (negative estimates read as zero
    * spread, the paper's treatment); the first period of a key (no
    * previous range) and non-positive lows are null.
    *
    * Scale shape: one (key, period) hash aggregate for the period
    * frame, then lag/greatest/least over the tiny per-key period window
    * — the tick stream aggregates before anything sorts.
    */
  def corwinSchultz(
      df: DataFrame, keyCols: Seq[String], periodCol: String,
      priceCol: String): DataFrame = {
    val per = df.filter(col(priceCol) > 0)
      .groupBy((keyCols :+ periodCol).map(col): _*)
      .agg(max(col(priceCol)).as("high"), min(col(priceCol)).as("low"),
        count(lit(1)).as("n_ticks"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(periodCol))
    val hPrev = lag(col("high"), 1).over(w)
    val lPrev = lag(col("low"), 1).over(w)
    val lhl = log(col("high") / col("low"))
    val lhlPrev = log(hPrev / lPrev)
    val beta = lhl * lhl + lhlPrev * lhlPrev
    val gamma = {
      val g = log(greatest(col("high"), hPrev) / least(col("low"), lPrev))
      g * g
    }
    val k = lit(CorwinSchultzK)
    val alpha = (sqrt(lit(2.0) * beta) - sqrt(beta)) / k - sqrt(gamma / k)
    val spreadRaw = lit(2.0) * (exp(alpha) - 1.0) / (exp(alpha) + 1.0)
    per
      .withColumn("__s", spreadRaw)
      .withColumn("spread_raw", sr6(col("__s") + lit(0.0)))
      // explicit null guard: Spark's greatest SKIPS nulls (first row of
      // a key would read as spread 0 instead of "no estimate")
      .withColumn("spread",
        when(col("__s").isNull, lit(null).cast("double"))
          .otherwise(sr6(greatest(col("__s"), lit(0.0)))))
      .drop("__s")
  }
}
