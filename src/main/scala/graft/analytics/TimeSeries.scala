package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics the reference's serving layer implies
  * (SURVEY §2.4 A1–A6, §2.5 W1–W5, §2.3 J2): candle re-aggregation, VWAP,
  * rolling stats, returns, ranking, as-of join.
  *
  * Scale notes: every operator here is a single hash-aggregate or a single
  * window over a keyed shuffle — one Exchange each, partial aggregation
  * map-side where Catalyst supports it. Windows partition by the series key
  * so state never exceeds one key's rows per task; skewed keys are the
  * caller's concern (salt or AQE skew handling).
  */
object TimeSeries {

  /** A1: re-aggregate fine-grained observations into coarser candles.
    * `first/last` are made deterministic with min_by/max_by on a strictly
    * ordering tiebreak column (`seqCol`, e.g. a unique event id) — never the
    * order-dependent first()/last().
    *
    * One shuffle on (key, bucket); partial min/max/sum are map-side.
    */
  def candles(
      ts: Column, key: Column, price: Column, volume: Column, seqCol: Column,
      bucket: String): DataFrame => DataFrame = { df =>
    df.groupBy(key.as("key"), window(ts, bucket).getField("start").as("bucket_start"))
      .agg(
        min_by(price, seqCol).as("open"),
        max(price).as("high"),
        min(price).as("low"),
        max_by(price, seqCol).as("close"),
        sum(volume).as("volume"),
        count(lit(1)).as("n"))
  }

  /** A2: volume-weighted average price per group. */
  def vwap(price: Column, volume: Column): Column =
    sum(price * volume) / sum(volume)

  /** W1: trailing moving average over the previous `n-1` rows and current. */
  def movingAvg(value: Column, partition: Seq[Column], order: Seq[Column], n: Int): Column =
    avg(value).over(
      Window.partitionBy(partition: _*).orderBy(order: _*).rowsBetween(-(n - 1), 0))

  /** W2: simple return vs the previous observation in the series. NULL when
    * there is no previous observation OR it is exactly zero (ANSI mode
    * would throw on the division; nullif matches the oracle's semantics).
    */
  def laggedReturn(value: Column, partition: Seq[Column], order: Seq[Column]): Column = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    value / nullif(lag(value, 1).over(w), lit(0.0)) - 1
  }

  /** W5: running (cumulative) sum within the series. */
  def runningSum(value: Column, partition: Seq[Column], order: Seq[Column]): Column =
    sum(value).over(
      Window.partitionBy(partition: _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** W3/D3: top-n rows per group by `order` (desc callers pass desc cols),
    * deterministic iff `order` is a total order within each group.
    */
  def topNPerGroup(partition: Seq[Column], order: Seq[Column], n: Int)(df: DataFrame): DataFrame =
    df.withColumn("rn", row_number().over(Window.partitionBy(partition: _*).orderBy(order: _*)))
      .filter(col("rn") <= n)

  /** Bounded-range join: pairs (left, right) with equal `key` and
    * rightTs in (leftTs - windowSec, leftTs].
    *
    * Scale shape: instead of a naive theta-join (O(n*m) per key), both sides
    * are bucketed to floor(epoch / windowSec); any right row in range lives
    * in the left row's bucket or the one before, so the left side explodes
    * to exactly two (bucket, key) probes and the join is a plain equi-join
    * on (key, bucket) with the exact range predicate as a residual filter.
    * Left-outer: left rows with no match survive with null right columns.
    *
    * `rightPayload` columns come back prefixed `r_`.
    */
  def boundedRangeJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, windowSec: Long,
      rightPayload: Seq[String]): DataFrame = {
    val usec = windowSec * 1000000L
    // integer `div`, not `/` (Spark `/` is double division)
    val l = left.withColumn("__b", explode(array(
      expr(s"unix_micros($leftTs) div $usec") - 1,
      expr(s"unix_micros($leftTs) div $usec"))))
    val r = right.select(
      Seq(col(key).as("__rkey"),
        expr(s"unix_micros($rightTs) div $usec").as("__rb"),
        col(rightTs).as("__rts")) ++ rightPayload.map(c => col(c).as(s"r_$c")): _*)
    // inner join: each matching right row lives in exactly one of the two
    // probed buckets, so no pair duplicates; callers wanting left-outer
    // semantics re-join unmatched lefts (see SparkEntry q42).
    l.join(r,
        col(key) === col("__rkey") && col("__b") === col("__rb") &&
          col("__rts") > col(leftTs) - expr(s"INTERVAL $windowSec seconds") &&
          col("__rts") <= col(leftTs))
      .drop("__b", "__rkey", "__rb", "__rts")
  }

  /** J2: as-of join — for each left row, the most recent right row with the
    * same key and rightTs <= leftTs.
    *
    * Spark has no native as-of join; rather than a range-join (O(n·m) blowup)
    * this uses the union + last(ignoreNulls) pattern: one shuffle on the key,
    * one ordered window pass, linear in |left|+|right|. At 100 TB this is the
    * scalable form — state per task is a single running "last right row"
    * value, and the sort is per-key within partitions.
    *
    * Right rows sort before left rows at equal timestamps (side 0 < 1), so
    * the match is inclusive (rightTs == leftTs matches), like DuckDB's
    * ASOF JOIN. `rightPayload` are the right columns to carry; they come back
    * prefixed as-is, null when no match (left-outer semantics).
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame = {
    val lCols = left.columns
    // Align the two sides into one frame: shared (key, ts, side) + both payloads.
    val l = left
      .withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
      .select(Seq(col(key).as("__key"), col("__ts"), col("__side")) ++
        lCols.map(col) ++ rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .withColumn("__ts", col(rightTs)).withColumn("__side", lit(0))
      .select(Seq(col(key).as("__key"), col("__ts"), col("__side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(c => col(c).as(s"__r_$c")): _*)
    // tie-break among right rows sharing (key, ts) on the payload struct so
    // the match is deterministic (the largest payload tuple wins); DuckDB's
    // ASOF pick among exact-duplicate timestamps is likewise unspecified, so
    // callers should ensure right-side (key, ts) uniqueness for oracle work
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"),
        struct(rightPayload.map(c => col(s"__r_$c")): _*).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(Seq(col("__side")) ++ lCols.map(col) ++
        rightPayload.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }

  /** J2 with a staleness bound: as-of join whose match must lie within
    * `toleranceUs` of the left timestamp (pandas `merge_asof(tolerance)`
    * semantics — the latest earlier row is picked FIRST, then discarded
    * if it is too old; an older in-tolerance row never substitutes).
    * The financial meaning: "price the trade with the latest quote,
    * unless the quote is stale". Payload columns null out together with
    * the carried `lag_us` (exact integer micros), preserving left-outer
    * shape. Same one-window construction and scale behavior as
    * [[asOfJoin]] — the tolerance is a projection over the matched
    * timestamp, not a second join.
    */
  def asOfJoinTolerance(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      toleranceUs: Long): DataFrame = {
    require(toleranceUs >= 0, s"toleranceUs must be >= 0, got $toleranceUs")
    require(!rightPayload.contains("__matched_ts"), "__matched_ts is reserved")
    val r2 = right.withColumn("__matched_ts", col(rightTs))
    val lag = unix_micros(col(leftTs)) - unix_micros(col("__matched_ts"))
    val ok = col("__matched_ts").isNotNull && lag <= toleranceUs
    asOfJoin(left, r2, key, leftTs, rightTs, rightPayload :+ "__matched_ts")
      .select(left.columns.map(col) ++
        rightPayload.map(c => when(ok, col(c)).as(c)) :+
        when(ok, lag).as("lag_us"): _*)
  }

  /** J2 for SKEWED keys: as-of join clustered on (key, time-bucket)
    * instead of the key alone. Both [[asOfJoin]] and the custom merge
    * operator ([[graft.plans.MergeAsOf]]) put every row of a key in ONE
    * task — a hyper-hot symbol serializes at scale. Here time is cut into
    * `bucketWidthSec` buckets and the hot key's work spreads over its
    * buckets; the price is two extra narrow shuffles over per-bucket
    * SUMMARY rows (≤ |distinct (key, bucket)|), not raw rows.
    *
    * Correctness: a left row's match is either in its own bucket or is
    * the last right row of the latest earlier non-empty bucket. Buckets
    * partition the time axis, so that "carry" candidate is exactly the
    * per-bucket max (ts, payload) struct of that bucket, forwarded to
    * each later left bucket by a per-key as-of pass over bucket
    * summaries. The final merge is the custom sort-merge as-of operator
    * keyed on struct(key, bucket) — same inclusive-backward,
    * max-payload-tie-break semantics as [[asOfJoin]], which the spec
    * asserts by equality.
    *
    * Rows with a null right timestamp are excluded (they have no bucket);
    * the unbucketed forms instead let them match any left time — filter
    * them out before calling either form if they are not real events.
    */
  def asOfJoinTimeBucketed(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      bucketWidthSec: Double): DataFrame = {
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    require(!rightPayload.contains(rightTs),
      "rightPayload must not repeat the rightTs column (it is carried implicitly)")
    val lCols = left.columns
    def bucket(ts: Column) = floor(ts.cast("double") / bucketWidthSec).cast("long")
    val lb = left.withColumn("__tb", bucket(col(leftTs)))
    val rb = right.filter(col(rightTs).isNotNull)
      .select(col(key).as("__rk"), bucket(col(rightTs)).as("__rtb"),
        struct(col(rightTs) +: rightPayload.map(col): _*).as("__cand"))
    val candType = rb.schema("__cand").dataType
    // per (key, right-bucket) summary: the max (ts, payload) struct — the
    // row the merge would hold at that bucket's end
    val bucketLast = rb.groupBy(col("__rk"), col("__rtb")).agg(max(col("__cand")).as("__cand"))
    // carry-forward: for each LEFT bucket, the summary of the latest right
    // bucket STRICTLY before it (a summary published at __rtb becomes
    // visible from bucket __rtb + 1 on; side 0 sorts before the left
    // marker at equal position, making the visibility inclusive there)
    val lBuckets = lb.select(col(key).as("__ck"), col("__tb")).distinct()
    val carryW = Window.partitionBy(col("__ck"))
      .orderBy(col("__cpos"), col("__cside"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = lBuckets
      .select(col("__ck"), col("__tb").as("__cpos"), lit(1).as("__cside"),
        lit(null).cast(candType).as("__cand"), col("__tb"))
      .unionByName(bucketLast.select(col("__rk").as("__ck"),
        (col("__rtb") + 1).as("__cpos"), lit(0).as("__cside"),
        col("__cand"), lit(null).cast("long").as("__tb")))
      .select(col("__ck"), col("__cside"), col("__tb"),
        last(col("__cand"), ignoreNulls = true).over(carryW).as("__cand"))
      .filter(col("__cside") === 1 && col("__cand").isNotNull)
      .select(col("__ck").as("__rk"), col("__tb").as("__rtb"), col("__cand"))
    // candidate set per (key, left-bucket): in-bucket rows + the carry;
    // final merge on the composite key spreads the hot key over buckets
    val cands = rb.unionByName(carry)
      .select(struct(col("__rk"), col("__rtb")).as("__kb"), col("__cand.*"))
    val lb2 = lb.withColumn("__kb", struct(col(key), col("__tb")))
    graft.plans.MergeAsOf.join(lb2, cands, "__kb", leftTs, rightTs)
      .select(lCols.map(col) ++ rightPayload.map(c => col(s"r_$c").as(c)): _*)
  }

  /** Time-weighted average price (TWAP) per (key, day): each
    * observation's value holds until the NEXT observation
    * (piecewise-constant interpolation), so the weight is the exact
    * integer-microsecond gap to the next row — the execution-quality
    * benchmark against which VWAP ([[vwap]]) measures volume skew; the
    * two diverge exactly when volume clusters at prices away from the
    * time-uniform mean. The day's last observation carries no forward
    * gap (weight 0); a single-observation day degrades to that value.
    *
    * One (key, day) window sort shared by the lead and the aggregate;
    * weights are integer micros so only the final products are float.
    */
  def twap(
      events: DataFrame, keyCol: String, tsCol: String, orderTieCol: String,
      valueCol: String): DataFrame = {
    val day = to_date(col(tsCol))
    val w = Window.partitionBy(col(keyCol), col("__day"))
      .orderBy(col(tsCol), col(orderTieCol))
    val dt = (lead(unix_micros(col(tsCol)), 1).over(w) - unix_micros(col(tsCol)))
      .cast("double")
    events
      .withColumn("__day", day)
      .withColumn("__dt", dt)
      .groupBy(col(keyCol), col("__day"))
      .agg(
        count(lit(1)).as("n"),
        graft.util.Partitioning.stableRound6(avg(col(valueCol))).as("simple_avg"),
        sum(col(valueCol) * col("__dt")).as("__wsum"),
        sum(col("__dt")).as("__tsum"),
        avg(col(valueCol)).as("__avg_raw"))
      .select(col(keyCol), date_format(col("__day"), "yyyy-MM-dd").as("day"),
        col("n"), col("simple_avg"),
        graft.util.Partitioning.stableRound6(
          when(col("__tsum") > 0, col("__wsum") / col("__tsum"))
            .otherwise(col("__avg_raw"))).as("twap"))
  }

  /** Fixed-cadence resample with forward fill — the missing-bar REPAIR
    * that pairs with gap DETECTION ([[graft.analytics.Behavior.gapStats]]):
    * each key's [min, max] bucket range expands to the full `stepSeconds`
    * grid, observed rows join back, and holes carry the latest earlier
    * value. Downstream indicators then see the fixed cadence they assume
    * (the reference's bars are nominally fixed-cadence; this is what
    * makes that true after an outage).
    *
    * The fill uses the portable run-partition construction, NOT
    * last(ignoreNulls): `count(value) over (key order bucket)` increments
    * only on observed rows, so each hole shares a run id with the
    * observation that opened it and `max over (key, run)` is the carried
    * value — deterministic, and the SQL oracle states it identically.
    *
    * Scale shape: bounds are a per-key aggregate of the (already
    * aggregated) bar frame — in this self-contained form the bar subplan
    * executes twice (bounds + join side); at corpus scale precompute
    * [[resampleBounds]] once over a materialized bars frame and use the
    * precomputed-bounds overload to pay it once. The grid explode emits
    * only (key, bucket) pairs,
    * the join is keyed on them, and both windows ride ONE (key, bucket)
    * sort. Grid size is bounded by the observed time span / step, never
    * by row count.
    *
    * Output: (keyCol, bucketCol, valueCol — null in holes, `ffill`,
    * `is_gap`).
    */
  def resampleFfill(
      bars: DataFrame, keyCol: String, bucketCol: String, valueCol: String,
      stepSeconds: Long, maxGridPerKey: Long = 10000000L): DataFrame =
    resampleFfill(bars, keyCol, bucketCol, valueCol, stepSeconds, maxGridPerKey,
      resampleBounds(bars, keyCol, bucketCol))

  /** Per-key [min, max] of the bucket column — the precomputable bounds
    * artifact behind [[resampleFfill]]. At corpus scale compute this ONCE
    * over a materialized bars frame and pass it to the precomputed-bounds
    * overload, so the bars subplan executes once (join side only) instead
    * of twice — the [[graft.llmops.TextAnalysis.unigramVocab]]
    * artifact-reuse contract.
    */
  def resampleBounds(bars: DataFrame, keyCol: String, bucketCol: String): DataFrame =
    bars.groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("__mn"), max(col(bucketCol)).as("__mx"))

  /** [[resampleFfill]] over precomputed per-key bounds — (key, __mn, __mx)
    * as produced by [[resampleBounds]], persisted/computed under the
    * CALLER's lifecycle. The bars frame is consumed exactly once (the
    * grid join's right side); the self-contained form above pays the bars
    * subplan twice with lineage fully intact instead.
    *
    * STALENESS CONTRACT: `bounds` must cover the bars frame — same
    * snapshot, or a superset of its keys and bucket ranges. The grid is
    * built from `bounds` alone and bars joins left FROM the grid, so a
    * key absent from stale bounds vanishes from the output and a bucket
    * beyond a stale `__mx` is dropped — silently, by construction (the
    * self-contained form cannot exhibit this). If bars can grow between
    * the bounds computation and this call, recompute bounds or use the
    * self-contained overload.
    */
  def resampleFfill(
      bars: DataFrame, keyCol: String, bucketCol: String, valueCol: String,
      stepSeconds: Long, maxGridPerKey: Long, bounds: DataFrame): DataFrame = {
    val grid = resampleGrid(bounds, keyCol, bucketCol, stepSeconds, maxGridPerKey,
      "resampleFfill")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bars.select(col(keyCol), col(bucketCol), col(valueCol)),
        Seq(keyCol, bucketCol), "left")
      .withColumn("__run", count(col(valueCol)).over(w))
      .withColumn("ffill",
        max(col(valueCol)).over(Window.partitionBy(col(keyCol), col("__run"))))
      .withColumn("is_gap", col(valueCol).isNull.cast("int"))
      .drop("__run")
  }

  /** Shared dense-grid construction for the resample pair: one
    * (key, bucket) row per step across each key's [__mn, __mx] bounds,
    * with the in-plan OOM guard (the weightedSample raise_error pattern —
    * no extra scan): sequence() materializes one span/step-length ARRAY
    * per key before the explode, so a fine step over a long span must
    * fail loudly with the remedy, not OOM an executor.
    */
  private def resampleGrid(
      bounds: DataFrame, keyCol: String, bucketCol: String,
      stepSeconds: Long, maxGridPerKey: Long, op: String): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val slots = (unix_seconds(col("__mx")) - unix_seconds(col("__mn"))) / stepSeconds + 1
    val guardedMn = when(slots > maxGridPerKey,
      raise_error(concat(
        lit(s"$op: a key's grid needs "), slots.cast("string"),
        lit(s" slots > maxGridPerKey=$maxGridPerKey — the per-key sequence() array " +
          "would not fit an executor. Use a coarser step, split the time range, " +
          "or raise maxGridPerKey deliberately with executor memory to match."))
      ).cast("timestamp")).otherwise(col("__mn"))
    bounds.select(col(keyCol),
      explode(sequence(guardedMn, col("__mx"),
        expr(s"interval $stepSeconds seconds"))).as(bucketCol))
  }

  /** A1+ information-driven bars: re-bar a series by cumulative VOLUME
    * instead of wall-clock (volume bars — López de Prado ch. 2, public
    * methodology; with volume = price·qty these are dollar bars). Time
    * bars oversample quiet periods and undersample bursts; volume bars
    * hold information-per-bar roughly constant, which is what downstream
    * indicators assume. A row joins bar `floor(cumExclusive / threshold)`
    * — the bar its PRE-row cumulative lands in, so a bar closes with the
    * row that crosses the threshold (each bar's volume is ≥ threshold
    * except the final partial bar).
    *
    * Determinism contract: volumes are micro-quantized per ROW
    * (floor(v·10⁶+0.5) as BIGINT — one correctly-rounded step over the
    * identical parquet double, the X8 long-micros pattern), so the
    * running sum is EXACT integer arithmetic and the bar id an exact
    * integer division — immune to the engine's window-sum association
    * order, which a double running sum under a floor() would not be (a
    * 1-ulp difference at a threshold multiple would move the crossing
    * row into a different bar, and a GROUP BY key cannot be rounded
    * after the fact). Negative volumes fail in-plan (integer division
    * truncates toward zero in Spark but floors in DuckDB — the contract
    * only holds on non-negative cumulative volume, which is also the
    * only physically meaningful input). OHLC first/last use
    * min_by/max_by on `seqCol` (the [[candles]] rule), never
    * order-dependent first()/last().
    *
    * Scale shape: one (key, order) sort for the running sum; the bar
    * aggregate reuses the window's key partitioning (clustered on key ⊆
    * (key, bar)) — a single exchange end to end.
    */
  def volumeBars(
      df: DataFrame, keyCol: String, order: Seq[String], priceCol: String,
      volumeCol: String, seqCol: String, threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val thresholdMicros = math.floor(threshold * 1000000d + 0.5d).toLong
    require(thresholdMicros > 0, s"threshold too small to quantize: $threshold")
    val vu = when(col(volumeCol) < 0,
      raise_error(concat(lit("volumeBars: negative volume "),
        col(volumeCol).cast("string"),
        lit(" — cumulative-volume bars need non-negative volumes"))))
      .otherwise(floor(col(volumeCol) * 1000000d + 0.5d).cast("long"))
    val w = Window.partitionBy(col(keyCol)).orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__vu", vu)
      .withColumn("__cum", coalesce(sum(col("__vu")).over(w), lit(0L)))
      .withColumn("__bar", expr(s"__cum div ${thresholdMicros}L"))
      .groupBy(col(keyCol), col("__bar").as("bar"))
      .agg(
        count(lit(1)).as("n_ticks"),
        min_by(col(priceCol), col(seqCol)).as("open"),
        max(col(priceCol)).as("high"),
        min(col(priceCol)).as("low"),
        max_by(col(priceCol), col(seqCol)).as("close"),
        sum(col(volumeCol)).as("volume"))
  }

  /** A1+: fixed-cadence resample with LINEAR interpolation — the other
    * half of the gap-filling pair ([[resampleFfill]] carries the last
    * print forward; this draws the straight line between the surrounding
    * prints, the standard treatment for slowly-varying series like
    * rates/marks where a step function biases downstream returns).
    * Leading gaps (before the first observation) backfill from the next
    * value; trailing gaps forward-fill from the previous — the
    * nearest-known edge convention.
    *
    * Same grid construction and guard as [[resampleFfill]]. The
    * neighbor lookup deliberately avoids `rowsBetween(currentRow,
    * unboundedFollowing)` frames: Spark plans those as
    * UnboundedFollowingWindowFunctionFrame, which RE-AGGREGATES the
    * remaining frame for every row — O(grid²) per key. Instead both
    * neighbors come from the run-group trick (count-of-non-nulls as a
    * group id, one O(n) pass each way): an ascending run tags every row
    * with its previous print, a descending run with its next. Two
    * (key, bucket) sorts over the GRID frame — still linear, and the
    * grid is bounded by span/step, never by row count.
    *
    * Determinism contract: the interpolation fraction is a ratio of
    * exact BIGINT epoch-MICROS differences (`unix_micros` ↔ the oracle's
    * `epoch_us`), cast to double at the division — one correctly-rounded
    * IEEE op per engine, so the oracle reproduces it bit-identically
    * (round the OUTPUT, not the inputs).
    *
    * Output: (keyCol, bucketCol, valueCol — null in holes, `lerp`,
    * `is_gap`).
    */
  def resampleLinear(
      bars: DataFrame, keyCol: String, bucketCol: String, valueCol: String,
      stepSeconds: Long, maxGridPerKey: Long = 10000000L): DataFrame =
    resampleLinear(bars, keyCol, bucketCol, valueCol, stepSeconds, maxGridPerKey,
      resampleBounds(bars, keyCol, bucketCol))

  /** [[resampleLinear]] over precomputed per-key bounds — same
    * [[resampleBounds]] artifact and STALENESS CONTRACT as the ffill
    * overload: the bars frame is consumed once (join side only) instead
    * of twice.
    */
  def resampleLinear(
      bars: DataFrame, keyCol: String, bucketCol: String, valueCol: String,
      stepSeconds: Long, maxGridPerKey: Long, bounds: DataFrame): DataFrame = {
    val grid = resampleGrid(bounds, keyCol, bucketCol, stepSeconds, maxGridPerKey,
      "resampleLinear")
    val asc = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // micros, not seconds: the oracle's exact-BIGINT mirror is epoch_us
    val e = unix_micros(col(bucketCol))
    val known = when(col(valueCol).isNotNull, e)
    val prevG = Window.partitionBy(col(keyCol), col("__runf"))
    val nextG = Window.partitionBy(col(keyCol), col("__runb"))
    grid.join(bars.select(col(keyCol), col(bucketCol), col(valueCol)),
        Seq(keyCol, bucketCol), "left")
      .withColumn("__runf", count(col(valueCol)).over(asc))
      .withColumn("__runb", count(col(valueCol)).over(desc))
      // each run group holds exactly one print (the row that bumped the
      // count) — max() selects it without order dependence
      .withColumn("__prev", max(col(valueCol)).over(prevG))
      .withColumn("__preve", max(known).over(prevG))
      .withColumn("__next", max(col(valueCol)).over(nextG))
      .withColumn("__nexte", max(known).over(nextG))
      .withColumn("lerp",
        when(col(valueCol).isNotNull, col(valueCol).cast("double"))
          .when(col("__prev").isNull, col("__next").cast("double"))
          .when(col("__next").isNull, col("__prev").cast("double"))
          .otherwise(col("__prev") +
            (col("__next") - col("__prev")) *
              ((e - col("__preve")).cast("double") /
                (col("__nexte") - col("__preve")).cast("double"))))
      .withColumn("is_gap", col(valueCol).isNull.cast("int"))
      .drop("__runf", "__runb", "__prev", "__preve", "__next", "__nexte")
  }

  /** CORPORATE-ACTION back-adjustment (X86): the reference's bar schema
    * carries `Dividends` and `Stock Splits` end to end — the producer
    * fetches them (`scripts/finance-collect-data/StockFinanceMetrics.py:74`,
    * `Ticker.history()`; wire schema
    * `scripts/spark_streaming_processing/yfinance_processing.py:23-24`),
    * the Cassandra table stores them
    * (`dags/ingestion_yfinance_data_to_cassandra_db.py:132-133`) — but
    * nothing downstream USES them; the analytics they exist for is
    * exactly this: a total-return-consistent adjusted close, so returns
    * computed across an ex-date or a split don't read a corporate
    * action as a price move. CRSP/yfinance-style BACKWARD adjustment:
    *
    *   adj_close(t) = close(t) · Π_{events s > t} f(s),
    *   f(s) = (1 − div(s) / close(s⁻)) / split(s)
    *
    * — the latest bar is unadjusted, history scales down past each
    * ex-date/split. Per-event factors round (sr6) BEFORE the product
    * (the q187 fitted-param discipline) and the product folds LEFT TO
    * RIGHT over the time-ascending event list in both engines (Spark
    * `aggregate`, DuckDB `list_reduce` over the same rounded doubles) —
    * bit-identical adjusted closes, no rounding at emission.
    *
    * Contracts: (keyCol, timeCol) must be UNIQUE — a duplicate bar
    * makes the lag() base price nondeterministic and would silently
    * corrupt per-event factors, so duplicates fail IN-PLAN with a named
    * error (the check rides the existing keyed lag window — a duplicate
    * time shows up as lag(time) == time in the ordered pass, no extra
    * exchange; duplicate rows are classified as events so the guard is
    * guaranteed to evaluate, the r14 guard-predicate lesson). A
    * dividend ≥ the prior close (factor ≤ 0 — data corruption, adjusted
    * prices would flip sign) and a non-positive split likewise fail
    * in-plan with named errors; a dividend on a key's FIRST bar has no
    * base price and adjusts nothing (its factor degrades to the pure
    * split term — there are no earlier rows for it to scale); null/zero
    * dividend and null/zero/one split mean "no event".
    *
    * Scale shape: one keyed lag window for the base prices, one filter
    * to the (rare) event rows, one |keys|-sized hash aggregate
    * collecting each key's sorted event list, one BROADCAST join of
    * that tiny frame back onto the bars, and a per-row fold over the
    * key's later events (events per key is corporate-action-rare —
    * single digits a year). The CALLER's frame is read twice (event
    * extraction + the final join) — persist/checkpoint a lazily
    * derived bar frame before passing it, or both branches recompute
    * its lineage (q224 pins the pattern).
    */
  /** X93: FEED-GAP detection, batch form — the outage read the
    * reference's polling producers imply and never surface: bars are
    * fetched every ~20 s per ticker
    * (`scripts/finance-collect-data/StockFinanceMetrics.py:114-127`)
    * and trades stream at websocket rate, so silence beyond the
    * expected cadence IS an incident, currently invisible. Per key,
    * every consecutive-event gap wider than `maxGapUs`:
    * (key, gap_start, gap_end, gap_us) — exact integer micros.
    *
    * One keyed lag window (shares W2's shape — at scale this is one
    * shuffle + one ordered pass, linear). The streaming form is
    * [[graft.streaming.StatefulOps.feedGapsStream]] (watermark-complete,
    * equal to this on completed gaps).
    */
  def feedGaps(
      df: DataFrame, keyCol: String, tsCol: String, maxGapUs: Long): DataFrame = {
    require(maxGapUs > 0, s"maxGapUs must be positive, got $maxGapUs")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    df.select(col(keyCol).as("key"), prev.as("gap_start"), col(tsCol).as("gap_end"))
      .withColumn("gap_us", unix_micros(col("gap_end")) - unix_micros(col("gap_start")))
      .filter(col("gap_us") > maxGapUs)
  }

  def adjustedClose(
      df: DataFrame, keyCol: String, timeCol: String, closeCol: String,
      dividendCol: String, splitCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
    val div = coalesce(col(dividendCol).cast("double"), lit(0.0))
    val split0 = coalesce(col(splitCol).cast("double"), lit(0.0))
    // duplicate (key, time) detection on the SAME ordered window the lag
    // rides: equal adjacent timestamps == a duplicate bar
    val dupBar = lag(col(timeCol), 1).over(w) <=> col(timeCol)
    // ANY nonzero-dividend or non-{0,1}-split row is an event — including
    // corrupt negatives and duplicate bars, which must reach the guards
    // below rather than silently not counting as events
    val isEvent = dupBar || div =!= 0.0 || (split0 =!= 0.0 && split0 =!= 1.0)
    val splitEff = when(split0 > 0.0, split0)
      .when(split0 === 0.0, lit(1.0))
      .otherwise(raise_error(format_string(
        "adjustedClose: non-positive split ratio %s at key %s, %s — a " +
          "split must be > 0 (new shares per old share)",
        split0.cast("string"), col(keyCol).cast("string"),
        col(timeCol).cast("string"))))
    val prev = lag(col(closeCol).cast("double"), 1).over(w)
    val divTerm = when(div === 0.0 || prev.isNull, lit(1.0))
      .when(div > 0.0 && div < prev, lit(1.0) - div / prev)
      .otherwise(raise_error(format_string(
        "adjustedClose: dividend %s outside (0, prior close %s) at key " +
          "%s, %s — the adjustment factor would be <= 0 or inflate " +
          "history (corrupt corporate-action data); fix the feed before " +
          "adjusting",
        div.cast("string"), prev.cast("string"),
        col(keyCol).cast("string"), col(timeCol).cast("string"))))
    val f = when(dupBar, raise_error(format_string(
        "adjustedClose: duplicate bar at key %s, %s — (key, time) must be " +
          "unique (a duplicate makes the lag() base price nondeterministic " +
          "and silently corrupts per-event factors); dedup the bars before " +
          "adjusting",
        col(keyCol).cast("string"), col(timeCol).cast("string"))).cast("double"))
      .otherwise(graft.util.Partitioning.stableRound6(divTerm / splitEff + lit(0.0)))
    val events = df
      .withColumn("__f", when(isEvent, f))
      .filter(col("__f").isNotNull)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(timeCol).as("t"), col("__f").as("f")))).as("__evs"))
    df.join(broadcast(events), Seq(keyCol), "left")
      .withColumn("adj_close",
        col(closeCol).cast("double") * coalesce(
          aggregate(
            filter(col("__evs"), e => e.getField("t") > col(timeCol)),
            lit(1.0),
            (acc, e) => acc * e.getField("f")),
          lit(1.0)))
      .drop("__evs")
  }
}
