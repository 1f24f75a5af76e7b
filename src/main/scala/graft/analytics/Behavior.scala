package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / data-quality analytics over keyed event streams: funnel
  * conversion, cohort retention, and feed-gap detection — the queries a
  * finance ingestion pipeline's consumers run to answer "did the user
  * convert", "do users come back", and "did the feed drop bars"
  * (the reference emits fixed-cadence 1-minute bars:
  * `scripts/finance-collect-data/StockFinanceMetrics.py:52` — gap
  * detection is how downstream spots missing ones).
  *
  * Scale shape: funnel rides the as-of join (one keyed shuffle, merge
  * semantics — see [[TimeSeries.asOfJoin]]); cohorts are two hash
  * aggregates and an equi-join on user, all shuffles keyed on uniform
  * ids; gaps are one window sort per key. Nothing driver-resident.
  */
object Behavior {

  /** Funnel conversion: for each `convertEvent` row, the latest
    * at-or-before `entryEvent` row per key (as-of), then per-key
    * conversion stats. `latency_s` is epoch-microsecond difference /
    * 1e6 — exact integer micros before the one division, so portable.
    *
    * Output: key, n_convert, n_converted (with a matching entry),
    * avg_latency_s (over converted rows only).
    */
  def funnel(
      events: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      entryEvent: String, convertEvent: String): DataFrame = {
    val conv = events.filter(col(typeCol) === convertEvent)
      .select(col(keyCol), col(tsCol))
    val entry = events.filter(col(typeCol) === entryEvent)
      .select(col(keyCol), col(tsCol), col(tsCol).as("entry_ts"))
    TimeSeries.asOfJoin(conv, entry, keyCol, tsCol, tsCol, Seq("entry_ts"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_convert"),
        count(col("entry_ts")).as("n_converted"),
        graft.util.Partitioning.stableRound6(
          avg((unix_micros(col(tsCol)) - unix_micros(col("entry_ts"))).cast("double")
            / lit(1000000.0))).as("avg_latency_s"))
  }

  /** Cohort retention: users grouped by their FIRST activity date, then
    * distinct active (user, day) pairs joined back — counts per
    * (cohort_date, day_offset). Both aggregates shrink before the join;
    * the join key is the uniform user id.
    */
  def cohortRetention(
      events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val cohorts = events.groupBy(col(keyCol))
      .agg(min(to_date(col(tsCol))).as("cohort_date"))
    val activity = events.select(col(keyCol), to_date(col(tsCol)).as("d")).distinct()
    activity.join(cohorts, Seq(keyCol))
      .groupBy(col("cohort_date"), datediff(col("d"), col("cohort_date")).as("day_offset"))
      .agg(countDistinct(col(keyCol)).as("n_users"))
  }

  /** Gap-based sessionization: a new session starts where the
    * inter-arrival gap exceeds `gapUs` (exact epoch micros). The running
    * sum of break flags IS the per-key session index — one window sort,
    * the same construction `session_window` uses internally but exposed
    * relationally so downstream joins/aggregates can key on
    * (key, session_idx). Adds `session_idx` (1-based).
    */
  def sessionize(
      events: DataFrame, keyCol: String, tsCol: String, orderTieCol: String,
      gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(orderTieCol))
    val gap = unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w)
    events
      .withColumn("__new", when(gap.isNull || gap > gapUs, lit(1L)).otherwise(lit(0L)))
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Type-2 (SCD2) change history of a derived attribute over a keyed
    * event series: consecutive runs of the same attribute value collapse
    * to one row carrying [valid_from, valid_to) — valid_to null on the
    * open (current) run. The warehouse-standard versioned-dimension
    * shape, and simultaneously run-length compression for telemetry
    * (a 1 Hz feed whose tier changes hourly shrinks ~3600x).
    *
    * Two window stages over the SAME (key, time) sort: change detection
    * against the lag (null-safe), then the next change's timestamp via
    * lead over the surviving rows. One shuffle total.
    */
  def typeTwoHistory(
      events: DataFrame, keyCol: String, tsCol: String, orderTieCol: String,
      attr: Column, attrName: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(orderTieCol))
    events
      .withColumn(attrName, attr)
      .withColumn("__prev", lag(col(attrName), 1).over(w))
      .filter(!(col(attrName) <=> col("__prev")))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
      .select(col(keyCol), col(attrName), col("valid_from"), col("valid_to"), col("is_current"))
  }

  /** First-order Markov transition matrix over a keyed event-type
    * sequence: counts and conditional probabilities of `cur` following
    * `prev` within each key's (time, tie) order. The sequence-mining
    * primitive behind "what do users do next" dashboards and behavioral
    * anomaly baselines.
    *
    * Scale shape: one window sort per key computes the lag; the count
    * aggregate shrinks the frame to |types|² rows BEFORE the probability
    * window runs — the normalizing `sum over (prev)` window therefore
    * sorts a tiny aggregated frame, not the event stream.
    *
    * Output: prev_type, event_type (= cur), n, prob (round-6).
    */
  def transitionMatrix(
      events: DataFrame, keyCol: String, tsCol: String, orderTieCol: String,
      typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(orderTieCol))
    val wPrev = Window.partitionBy(col("prev_type"))
    events
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("prob",
        graft.util.Partitioning.stableRound6(
          col("n").cast("double") / sum(col("n")).over(wPrev).cast("double")))
  }

  /** Session path mining: event-type trigrams WITHIN a session (gap
    * break > `gapUs`), counted globally and ranked — the "most common
    * 3-step journeys" query. Trigrams come from two lags over the same
    * (key, session) window sort — no collect_list, no explode: a path
    * is a row the moment its third step arrives, so the only state per
    * partition is the window's two-row lag buffer.
    *
    * Output: top-`k` of (path, n) by count desc, path asc (deterministic).
    */
  def sessionPathTrigrams(
      events: DataFrame, keyCol: String, tsCol: String, orderTieCol: String,
      typeCol: String, gapUs: Long, k: Int): DataFrame = {
    val sessions = sessionize(events, keyCol, tsCol, orderTieCol, gapUs)
    val w = Window.partitionBy(col(keyCol), col("session_idx"))
      .orderBy(col(tsCol), col(orderTieCol))
    sessions
      .withColumn("__t1", lag(col(typeCol), 2).over(w))
      .withColumn("__t2", lag(col(typeCol), 1).over(w))
      .filter(col("__t1").isNotNull)
      .select(concat_ws(">", col("__t1"), col("__t2"), col(typeCol)).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Trailing `windowDays`-day rolling distinct actives (the WAU/MAU
    * family). COUNT DISTINCT over a sliding frame is not expressible as
    * a window function (distinct aggregates are unsupported over
    * frames, in Spark and in SQL generally); the scalable construction
    * inverts it: each (user, active-day) CONTRIBUTES to the
    * `windowDays` window-end days it falls into, and a plain
    * count-distinct per end-day over the contribution stream gives the
    * rolling metric. Shuffle volume is |user-days| × windowDays small
    * rows — linear in activity, never quadratic in days; no self-join
    * of the day grid. Output is restricted to OBSERVED days (inner
    * join), so trailing windows past the data's end don't dangle;
    * days render as ISO strings (the cross-engine DATE discipline).
    */
  def rollingDistinctActives(
      events: DataFrame, keyCol: String, tsCol: String,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val userDays = events
      .select(col(keyCol), to_date(col(tsCol)).as("d")).distinct()
    val observed = userDays.select(col("d")).distinct()
    userDays
      .select(col(keyCol), col("d"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("__o"))
      .select(col(keyCol), date_add(col("d"), col("__o")).as("d"))
      .join(observed, Seq("d"))
      .groupBy(col("d"))
      .agg(countDistinct(col(keyCol)).as("n_active"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("n_active"))
  }

  /** Feed-gap detection: per-key inter-arrival gaps in exact epoch
    * micros; reports gaps exceeding `thresholdUs` and the worst gap.
    */
  def gapStats(
      events: DataFrame, keyCol: String, tsCol: String, orderTieCol: String,
      thresholdUs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(orderTieCol))
    events
      .withColumn("__gap_us", unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w))
      .groupBy(col(keyCol))
      .agg(
        count(when(col("__gap_us") > thresholdUs, lit(1))).as("n_gaps"),
        max(col("__gap_us")).as("max_gap_us"),
        count(lit(1)).as("n_rows"))
  }

  /** Hour-of-day SEASONALITY profile of `valueCol` per key: each bucket's
    * n/mean/stddev plus the one-sample t statistic of the bucket mean
    * against the key's OVERALL mean — the intraday-effect screen (is the
    * 14:00 bucket genuinely different, or noise?). t is null when the
    * bucket can't support it (n < 2 or zero variance).
    *
    * Scale shape: one (key, hour) hash aggregate over the event frame,
    * one |keys|-row aggregate broadcast back — the 24-bucket profile
    * frame is tiny at any corpus size; no windows, no sorts.
    */
  def seasonalityProfile(
      events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    import graft.util.Partitioning.{stableRound6 => sr6}
    val byHour = events
      .withColumn("hour", hour(col(tsCol)))
      .groupBy(col(keyCol), col("hour"))
      .agg(
        count(col(valueCol)).as("n"),
        avg(col(valueCol)).as("__mean_h"),
        stddev_samp(col(valueCol)).as("__sd_h"))
    val overall = events.groupBy(col(keyCol))
      .agg(avg(col(valueCol)).as("__mean_all"))
    byHour.join(broadcast(overall), Seq(keyCol))
      .withColumn("mean_h", sr6(col("__mean_h")))
      .withColumn("t_stat",
        when(col("__sd_h").isNull || col("__sd_h").isNaN || col("__sd_h") === 0.0,
          lit(null).cast("double"))
          .otherwise(sr6((col("__mean_h") - col("__mean_all")) /
            (col("__sd_h") / sqrt(col("n").cast("double"))) + lit(0.0))))
      .drop("__mean_h", "__sd_h", "__mean_all")
  }
}
