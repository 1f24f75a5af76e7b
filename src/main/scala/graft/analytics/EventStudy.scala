package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Partitioning.{stableRound6 => sr6}

/** Event-study machinery (MacKinlay 1997's standard shape): how does an
  * entity's signal move, relative to the cross-sectional mean, on and
  * after the days an event of interest fires?
  */
object EventStudy {

  /** Daily CUMULATIVE ABNORMAL RETURN around anchor days, per entity:
    *
    *   1. day frame: each entity's daily signal (BIGINT micro-quantized
    *      sum of `valueCol` — the q169 exactness trick) plus an anchor
    *      flag (any row matching `anchor` that day);
    *   2. r = day-over-day change per entity; market = cross-sectional
    *      mean r per day; abnormal ar = r − market;
    *   3. CAR = Σ ar over the anchor day and the next `horizonDays`
    *      OBSERVED days (row-relative, the trading-day convention — a
    *      calendar gap does not pad zeros);
    *   4. report per entity: anchor-day count, mean CAR, mean same-day
    *      abnormal move.
    *
    * Null discipline: an entity's first day has no r (excluded from the
    * market mean and from CAR by the SQL skip-null convention); a
    * window whose every ar is null yields a null CAR; entities with no
    * anchor days report null means (nothing to average).
    *
    * Scale shape: one (entity, day) hash aggregate, one |days|-row
    * aggregate broadcast back, one per-entity window over its days, a
    * final per-entity aggregate. The tick stream collapses before
    * anything sorts; nothing global.
    *
    * Caller-frame audit (r13 sweep): the anchor enters as a Column
    * PREDICATE, not a frame — the broadcast `mkt` side is derived
    * in-plan by `groupBy(day)` and is therefore unique per day by
    * construction; no duplicate-key hazard exists to guard.
    */
  def carDaily(
      events: DataFrame, entityCol: String, tsCol: String, valueCol: String,
      anchor: Column, horizonDays: Int): DataFrame = {
    require(horizonDays >= 0, s"horizonDays must be >= 0, got $horizonDays")
    val day = date_format(col(tsCol), "yyyy-MM-dd")
    val daily = events.groupBy(col(entityCol), day.as("day"))
      .agg(
        (sum(floor(col(valueCol) * 1000000d + 0.5d).cast("long")).cast("double")
          / 1000000d).as("__uval"),
        max(when(anchor, 1).otherwise(0)).as("__anchor"))
    val w = Window.partitionBy(col(entityCol)).orderBy(col("day"))
    val withR = daily.withColumn("__r", col("__uval") - lag(col("__uval"), 1).over(w))
    val mkt = withR.groupBy(col("day")).agg(avg(col("__r")).as("__mkt"))
    val ar = withR.join(broadcast(mkt), Seq("day"))
      .withColumn("__ar", col("__r") - col("__mkt"))
    val carW = Window.partitionBy(col(entityCol)).orderBy(col("day"))
      .rowsBetween(0, horizonDays)
    ar.withColumn("__car", sum(col("__ar")).over(carW))
      .groupBy(col(entityCol))
      .agg(
        count(when(col("__anchor") === 1, lit(1))).as("n_events"),
        sr6(avg(when(col("__anchor") === 1, col("__car"))) + lit(0.0)).as("mean_car"),
        sr6(avg(when(col("__anchor") === 1, col("__ar"))) + lit(0.0)).as("mean_ar0"))
  }
}
