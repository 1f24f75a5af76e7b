package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Technical indicators over keyed time series — the analytics a finance
  * ingestion pipeline (reference:
  * `dags/ingestion_yfinance_data_to_cassandra_db.py` writes 1-minute OHLCV
  * bars; `scripts/finance-collect-data/StockFinanceMetrics.py:52` emits the
  * closed bar) serves to downstream consumers: momentum (RSI), volatility
  * envelopes (Bollinger), peak-to-trough risk (drawdown), and cross-series
  * co-movement (pairwise correlation).
  *
  * Scale shape: every indicator is ONE hash-partitioned sort within the
  * series key (`Window.partitionBy(key).orderBy(time)`) — the shuffle moves
  * each series to one task and all frames evaluate in a single pass over
  * the sorted run. Nothing here is iterative or driver-resident; a million
  * symbols parallelize as a million independent window groups. Where an
  * indicator needs a window OVER a window (RSI's average gain over lagged
  * diffs), it is expressed as two select stages over the SAME window spec,
  * so Catalyst collapses them into one Window physical node pair sharing
  * one sort.
  */
object Indicators {

  import graft.util.Partitioning.{stableRound6 => sr6}

  /** Cutler's RSI (simple-moving-average form) over the trailing `n` rows:
    * `100 * avgGain / (avgGain + avgLoss)`, with the flat-series 0/0 case
    * pinned to 50 (neutral) and the first row (no lag) null. The SMA form
    * is chosen over Wilder's recursive EMA deliberately: it is
    * frame-expressible (one window pass, no recurrence), which keeps it
    * inside Spark's Window codegen AND makes it bit-portable to the SQL
    * oracle — a recurrence would need driver-side iteration or
    * flatMapGroups and could not be verified against DuckDB exactly.
    */
  def rsi(
      df: DataFrame, valueCol: String, out: String,
      partition: Seq[String], order: Seq[String], n: Int): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
    val frame = w.rowsBetween(-(n - 1), 0)
    val diff = col(valueCol) - lag(col(valueCol), 1).over(w)
    // Explicit CASE, not greatest(diff, 0): Spark's greatest SKIPS nulls
    // (greatest(null, 0) = 0), which would count the first row of every
    // series as a zero-gain observation instead of excluding it — and
    // null-skipping is exactly the engine-specific edge a portable
    // oracle can't rely on.
    df.withColumn("__gain",
        when(diff.isNull, lit(null).cast("double"))
          .when(diff > 0.0, diff).otherwise(lit(0.0)))
      .withColumn("__loss",
        when(diff.isNull, lit(null).cast("double"))
          .when(diff < 0.0, -diff).otherwise(lit(0.0)))
      .withColumn("__ag", avg(col("__gain")).over(frame))
      .withColumn("__al", avg(col("__loss")).over(frame))
      .withColumn(out,
        when(col("__ag").isNull || col("__al").isNull, lit(null).cast("double"))
          .when(col("__ag") + col("__al") === 0.0, lit(50.0))
          .otherwise(sr6(lit(100.0) * col("__ag") / (col("__ag") + col("__al")))))
      .drop("__gain", "__loss", "__ag", "__al")
  }

  /** Per-key maximum drawdown: the deepest relative drop from the running
    * peak, `min(value / runningMax(value) - 1)`. One window pass for the
    * running max, one hash aggregate for the min — the classic
    * peak-to-trough risk statistic. Requires strictly positive values
    * (ratios of a running max are meaningless through zero); callers
    * filter first.
    */
  def maxDrawdown(
      df: DataFrame, valueCol: String, partition: Seq[String],
      order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__peak", max(col(valueCol)).over(w))
      .groupBy(partition.map(col): _*)
      .agg(
        sr6(min(col(valueCol) / col("__peak") - 1.0)).as("max_drawdown"),
        sr6(max(col("__peak"))).as("peak"))
  }

  /** Underwater (drawdown-spell) statistics — the recovery-TIME view
    * [[maxDrawdown]]'s depth-only summary misses: a spell opens when the
    * running peak is refreshed and collects the rows strictly below that
    * peak until the series recovers to it (ties with the prior peak count
    * as recovery). Output per partition:
    *   - `n_spells`: completed-or-open spells with ≥1 underwater row,
    *   - `max_underwater`: the longest spell in ROWS (bars), the
    *     "longest time to recover" statistic,
    *   - `max_drawdown`: deepest relative trough (q77's metric, repeated
    *     here so one call serves a risk report).
    *
    * Scale shape: two window expressions over ONE (partition, order)
    * sort, then two hash aggregates that reuse the window's partitioning
    * (clustered on partition ⊆ both group keys) — a single exchange
    * total.
    */
  def underwaterSpells(
      df: DataFrame, valueCol: String, partition: Seq[String],
      order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = col(valueCol)
    df.withColumn("__peak", max(v).over(w))
      // spell id = how many at-peak rows precede (incl. this one): a row
      // AT the running peak opens/continues the recovered state, so each
      // refreshed peak starts a new spell for the rows under it
      .withColumn("__spell",
        sum(when(v === col("__peak"), 1L).otherwise(0L)).over(w))
      .withColumn("__uw", (v < col("__peak")).cast("long"))
      .groupBy((partition.map(col) :+ col("__spell")): _*)
      .agg(sum(col("__uw")).as("__uw_len"),
        min(v / col("__peak") - 1.0).as("__depth"))
      .groupBy(partition.map(col): _*)
      .agg(
        count(when(col("__uw_len") > 0L, 1L)).as("n_spells"),
        max(col("__uw_len")).as("max_underwater"),
        sr6(min(col("__depth"))).as("max_drawdown"))
  }

  /** Bollinger bands over the trailing `n` rows: SMA center line ±
    * `width` sample standard deviations, plus %B (where the value sits in
    * the band, 0 = lower, 1 = upper). Rows with an undefined band
    * (fewer than 2 frame rows → null stddev, or zero width) get null %B.
    */
  def bollinger(
      df: DataFrame, valueCol: String,
      partition: Seq[String], order: Seq[String], n: Int,
      width: Double = 2.0): DataFrame = {
    val frame = Window.partitionBy(partition.map(col): _*)
      .orderBy(order.map(col): _*).rowsBetween(-(n - 1), 0)
    val ma = avg(col(valueCol)).over(frame)
    val sd = stddev_samp(col(valueCol)).over(frame)
    df.withColumn("__ma", ma).withColumn("__sd", sd)
      .withColumn("mid", sr6(col("__ma")))
      .withColumn("upper", sr6(col("__ma") + lit(width) * col("__sd")))
      .withColumn("lower", sr6(col("__ma") - lit(width) * col("__sd")))
      .withColumn("pct_b",
        when(col("__sd").isNull || col("__sd") === 0.0, lit(null).cast("double"))
          .otherwise(sr6((col(valueCol) - (col("__ma") - lit(width) * col("__sd")))
            / (lit(2.0) * lit(width) * col("__sd")))))
      .drop("__ma", "__sd")
  }

  /** Bounded-horizon EWMA: exponentially weighted moving average over the
    * trailing `horizon` rows, weights `(1-alpha)^j` for lag j,
    * renormalized over the lags actually present (series head has fewer).
    * Expressed as `horizon` explicit lag terms over ONE window spec — a
    * single per-key sort, no recurrence, no self-join — which is what
    * makes it both frame-parallel at scale and bit-portable to the SQL
    * oracle (Wilder's unbounded recursive EMA is neither; with
    * `(1-alpha)^horizon` < 1e-3 for the defaults the truncation error is
    * below the rounding grid).
    */
  def ewma(
      df: DataFrame, valueCol: String, out: String,
      partition: Seq[String], order: Seq[String],
      alpha: Double, horizon: Int): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
    val terms = (0 until horizon).map { j =>
      val wj = math.pow(1.0 - alpha, j)
      val x = if (j == 0) col(valueCol) else lag(col(valueCol), j).over(w)
      (when(x.isNull, lit(0.0)).otherwise(lit(wj) * x),
        when(x.isNull, lit(0.0)).otherwise(lit(wj)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    // A null own-value row has no defined EWMA — pin it to null (matching
    // rsi/bollinger's discipline) instead of letting 0.0/0.0 emit NaN.
    // Null LAGS renormalize over the weights present: that is the
    // documented series-head behavior, and a mid-series null value simply
    // contributes no term.
    df.withColumn(out,
      when(col(valueCol).isNull, lit(null).cast("double")).otherwise(sr6(num / den)))
  }

  /** Rolling MEDIAN over the trailing `n` rows (current row included) —
    * the robust companion to the moving average: one outlier print moves
    * an SMA by outlier/n but leaves the median untouched, so
    * median-filtered series feed anomaly and indicator logic without
    * flash-spike contamination. Series heads use the median of whatever
    * rows exist. The LOWER median (element ⌈k/2⌉ of the sorted frame) is
    * returned rather than the interpolated midpoint: it is an actual
    * data value, so the cross-engine contract is pure element selection
    * — no arithmetic to drift (`element_at(array_sort(...))` ↔ DuckDB
    * `list_sort(...)[...]`). The median is over the frame's NON-NULL
    * values: collect_list silently drops nulls, so a null print shrinks
    * the frame rather than occupying a sorted slot — the oracle pins the
    * same semantic with an explicit list_filter (DuckDB's list() window
    * keeps nulls and would otherwise disagree on both the length and the
    * lower-median index); an all-null frame yields null.
    *
    * Scale shape: one (partition, order) sort; the frame materializes n
    * values per row (O(n log n) per-row sort in the projection) — the
    * exact-small-window regime. For large n, sketch-based quantiles are
    * the scale path; a 100 TB series with n ≤ a few hundred stays exact.
    */
  def rollingMedian(
      df: DataFrame, valueCol: String, out: String,
      partition: Seq[String], order: Seq[String], n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val frame = Window.partitionBy(partition.map(col): _*)
      .orderBy(order.map(col): _*).rowsBetween(-(n - 1), 0)
    val sorted = array_sort(collect_list(col(valueCol)).over(frame))
    // all-null frame -> empty list -> index 0 is an ANSI error, not a null
    df.withColumn(out,
      when(size(sorted) === 0, lit(null).cast("double"))
        .otherwise(element_at(sorted, ((size(sorted) + 1) / 2).cast("int"))))
  }

  /** Fixed-window FRACTIONAL differentiation (López de Prado ch. 5,
    * public methodology): x̃_t = Σ_{k<window} w_k·x_{t−k} with the
    * binomial-series weights of (1−B)^d —
    *
    *   w_0 = 1,  w_k = −w_{k−1}·(d−k+1)/k
    *
    * d ∈ (0,1) interpolates between the raw series (d=0, full memory,
    * non-stationary) and first differences (d=1, stationary, memoryless)
    * — the feature-engineering answer to "returns throw away the level".
    * Fixed-window form: the first `window−1` rows of each series have an
    * incomplete weight window and emit null (a null lag nulls the whole
    * sum — SQL null propagation is the contract in both engines, no CASE
    * scaffolding needed).
    *
    * Determinism contract: weights are computed once in driver doubles
    * and ride into the plan as literals; the oracle states them as
    * `CAST('<toString>' AS DOUBLE)` (string→double parse is correctly
    * rounded — the q103 EWMA pattern), so each term is bit-identical.
    *
    * Scale shape: `window` lag terms in ONE Window node over one
    * (partition, order) sort — q83's EWMA plan with different weights.
    */
  def fracDiff(
      df: DataFrame, valueCol: String, out: String,
      partition: Seq[String], order: Seq[String],
      d: Double, window: Int): DataFrame = {
    require(d > 0 && d < 1, s"d must be in (0,1), got $d")
    require(window >= 2, s"window must be >= 2, got $window")
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
    val weights = fracDiffWeights(d, window)
    val sum = weights.zipWithIndex.map { case (wk, k) =>
      val x = if (k == 0) col(valueCol) else lag(col(valueCol), k).over(w)
      lit(wk) * x
    }.reduce(_ + _)
    df.withColumn(out, sr6(sum))
  }

  /** The (1−B)^d binomial weights, w_0..w_{window−1} — exposed so the
    * oracle generator states the identical driver-computed doubles.
    */
  def fracDiffWeights(d: Double, window: Int): Seq[Double] =
    (1 until window).scanLeft(1.0) { (prev, k) => -prev * (d - k + 1) / k }

  /** Rolling trend strength: Pearson correlation between the value and
    * its time RANK over the trailing `n` rows — +1 on a steady climb,
    * -1 on a steady fall, ~0 chopping sideways (the "correlation
    * coefficient" indicator; rank-vs-value is Spearman-against-time).
    * One window pass; frames with < 2 rows or zero variance yield null
    * in both engines (corr's aggregate contract).
    */
  def rollingTrend(
      df: DataFrame, valueCol: String, out: String,
      partition: Seq[String], order: Seq[String], n: Int): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
    val frame = w.rowsBetween(-(n - 1), 0)
    // corr() itself would be evaluated unconditionally inside the Window
    // node and, under ANSI (Spark 4 default), DIVIDES BY ZERO on a
    // zero-variance frame (a flat price run). Build Pearson from
    // covar/stddev windows — none of which divide — and guard the one
    // division in the projection ABOVE the window, where CASE is lazy.
    // The rank is MASKED to null wherever the value is null so all three
    // moments aggregate the same complete pairs (corr's pairwise-deletion
    // contract — an unmasked rank stddev would mix populations).
    // stableRound6, not round(): the floor form is bit-portable at
    // half-boundaries and never yields IEEE negative zero.
    val sdv = stddev_samp(col(valueCol)).over(frame)
    val sdr = stddev_samp(col("__rnm")).over(frame)
    val cv = covar_samp(col(valueCol), col("__rnm")).over(frame)
    df.withColumn("__rnm",
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(row_number().over(w).cast("double")))
      .withColumn("__sdv", sdv).withColumn("__sdr", sdr).withColumn("__cv", cv)
      .withColumn(out,
        when(col("__sdv") > 0.0 && col("__sdr") > 0.0,
          sr6(col("__cv") / (col("__sdv") * col("__sdr"))))
          .otherwise(lit(null).cast("double")))
      .drop("__rnm", "__sdv", "__sdr", "__cv")
  }

  /** Average True Range over an OHLC series: TR = max(high-low,
    * |high-prevClose|, |low-prevClose|) (first bar: high-low), averaged
    * over the trailing `n` bars — the volatility unit position sizing is
    * quoted in. Explicit CASE on the missing lag (not greatest-over-null,
    * whose null-skipping is engine-specific). One window pass.
    */
  def atr(
      df: DataFrame, highCol: String, lowCol: String, closeCol: String,
      out: String, partition: Seq[String], order: Seq[String], n: Int): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
    val frame = w.rowsBetween(-(n - 1), 0)
    val pc = lag(col(closeCol), 1).over(w)
    val tr = when(pc.isNull, col(highCol) - col(lowCol))
      .otherwise(greatest(
        col(highCol) - col(lowCol),
        abs(col(highCol) - pc),
        abs(col(lowCol) - pc)))
    df.withColumn("__tr", tr)
      .withColumn(out, sr6(avg(col("__tr")).over(frame)))
      .drop("__tr")
  }

  /** Stochastic oscillator %K over an OHLC series:
    * `100 * (close - lowestLow(n)) / (highestHigh(n) - lowestLow(n))`,
    * null when the n-bar range is degenerate (flat). One window pass;
    * the division is guarded in the projection (ANSI-safe).
    */
  def stochasticK(
      df: DataFrame, highCol: String, lowCol: String, closeCol: String,
      out: String, partition: Seq[String], order: Seq[String], n: Int): DataFrame = {
    val frame = Window.partitionBy(partition.map(col): _*)
      .orderBy(order.map(col): _*).rowsBetween(-(n - 1), 0)
    df.withColumn("__ll", min(col(lowCol)).over(frame))
      .withColumn("__hh", max(col(highCol)).over(frame))
      .withColumn(out,
        when(col("__hh") > col("__ll"),
          sr6(lit(100.0) * (col(closeCol) - col("__ll")) / (col("__hh") - col("__ll"))))
          .otherwise(lit(null).cast("double")))
      .drop("__ll", "__hh")
  }

  /** On-balance volume: running sum of `sign(close change) * volume`
    * per series — the W5 cumulative family applied to OHLC (volume
    * flows tagged by price direction; the first bar contributes 0).
    * One window pass.
    */
  def obv(
      df: DataFrame, closeCol: String, volumeCol: String, out: String,
      partition: Seq[String], order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
    df.withColumn("__dir", signum(col(closeCol) - lag(col(closeCol), 1).over(w)))
      .withColumn(out,
        sr6(sum(coalesce(col("__dir"), lit(0.0)) * col(volumeCol))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .drop("__dir")
  }

  /** Beta to a benchmark: per-series OLS slope against the
    * bucket-aligned benchmark mean — `covar(v, m) / var(m)` over shared
    * buckets, the market-sensitivity statistic. Same shrink-first shape
    * as [[pairwiseCorr]]: both sides aggregate to |buckets| rows before
    * the join (the benchmark frame broadcasts), so cost is linear in
    * data and the join is tiny. The division is guarded in the
    * projection (zero benchmark variance over a series' buckets → null),
    * keeping the plan ANSI-safe.
    */
  def betaToBenchmark(
      df: DataFrame, seriesCol: String, bucketCol: Column,
      valueCol: String): DataFrame = {
    val series = df.groupBy(bucketCol.as("bucket"), col(seriesCol))
      .agg(avg(col(valueCol)).as("v"))
    val bench = df.groupBy(bucketCol.as("bucket"))
      .agg(avg(col(valueCol)).as("m"))
    series.join(broadcast(bench), Seq("bucket"))
      .groupBy(col(seriesCol))
      .agg(
        covar_samp(col("v"), col("m")).as("__cv"),
        var_samp(col("m")).as("__vm"),
        count(lit(1)).as("n_buckets"))
      .withColumn("beta",
        when(col("__vm") > 0.0, sr6(col("__cv") / col("__vm")))
          .otherwise(lit(null).cast("double")))
      .select(col(seriesCol), col("beta"), col("n_buckets"))
  }

  /** Pairwise Pearson correlation between named series, aligned on a
    * shared time bucket: series → per-(bucket, series) mean → self-join on
    * the bucket with `seriesA < seriesB` → `corr` per pair. The alignment
    * aggregate shrinks the data to |buckets| × |series| rows BEFORE the
    * self-join, so the quadratic blow-up is over series count only, never
    * over raw rows — at 100 TB the daily-bucket matrix for 10k symbols is
    * ~40 MB/decade, and the join broadcasts.
    */
  def pairwiseCorr(
      df: DataFrame, seriesCol: String, bucketCol: Column,
      valueCol: String): DataFrame = {
    val aligned = df
      .groupBy(bucketCol.as("bucket"), col(seriesCol).as("series"))
      .agg(avg(col(valueCol)).as("v"))
    val a = aligned.select(col("bucket"), col("series").as("series_a"), col("v").as("va"))
    val b = aligned.select(col("bucket"), col("series").as("series_b"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("series_a") < col("series_b"))
      .groupBy(col("series_a"), col("series_b"))
      .agg(
        // stableRound6, not round(): engines disagree on the sign of
        // round(-1e-9, 6) ("-0.0" vs "0.0"), so a zero-crossing
        // correlation would be a latent cross-engine hash mismatch.
        // Same negative-zero playbook as rollingTrend/contrastivePairs.
        sr6(corr(col("va"), col("vb"))).as("r"),
        count(lit(1)).as("n_buckets"))
  }

  /** Rolling z-score anomaly detection over a keyed series: each row
    * scored against the PRIOR `n` rows' mean/std (the frame shifted one
    * back, so a spike never normalizes itself away — same discipline as
    * the q107 Donchian prior-high). z is null until the warm-up window
    * holds >= 2 prior rows or while the window is flat (std 0 — a first
    * deviation from a constant series IS anomalous, but its z is
    * undefined; the flag uses the null-safe comparison, so flat-window
    * rows flag 0). One window sort per key; flags are exact.
    *
    * Output: adds `z` (round-6, null in warm-up/flat) and `is_anomaly`
    * (1 when |z| > threshold).
    */
  def rollingZScore(
      df: DataFrame, valueCol: String,
      partition: Seq[String], order: Seq[String], n: Int,
      threshold: Double = 3.0): DataFrame = {
    val frame = Window.partitionBy(partition.map(col): _*)
      .orderBy(order.map(col): _*).rowsBetween(-n, -1)
    val ma = avg(col(valueCol)).over(frame)
    val sd = stddev_samp(col(valueCol)).over(frame)
    df.withColumn("__ma", ma).withColumn("__sd", sd)
      .withColumn("z",
        when(col("__sd").isNull || col("__sd") === 0.0, lit(null).cast("double"))
          .otherwise(sr6((col(valueCol) - col("__ma")) / col("__sd"))))
      .withColumn("is_anomaly",
        coalesce((abs(col("z")) > threshold).cast("int"), lit(0)))
      .drop("__ma", "__sd")
  }

  /** 4·ln2 and 2·ln2−1: the Parkinson/Garman-Klass constants, computed
    * once in driver doubles and shipped to the oracle via the string-cast
    * parse (q103's bit-portability pattern for non-dyadic constants).
    */
  val ParkinsonDenom: Double = 4.0 * math.log(2.0)
  val GarmanKlassC: Double = 2.0 * math.log(2.0) - 1.0

  /** Range-based realized-volatility estimators per group over an OHLC
    * candle frame — the classical trio (public methodology):
    *
    *   - Parkinson (1980):        mean(ln(H/L)²) / (4·ln2)
    *   - Garman–Klass (1980):     mean(0.5·ln(H/L)² − (2·ln2−1)·ln(C/O)²)
    *   - Rogers–Satchell (1991):  mean(ln(H/C)·ln(H/O) + ln(L/C)·ln(L/O))
    *
    * Range estimators extract ~5-8× more information per bar than
    * close-to-close variance (the whole bar's excursion, not one print);
    * RS additionally tolerates nonzero drift, which biases the first
    * two. Variance scale (not annualized, not square-rooted — the caller
    * owns the horizon convention). Bars with a non-positive low are
    * excluded (a log-price estimator is undefined there; O, C, H ≥ L > 0
    * makes every ratio finite and positive).
    *
    * Determinism contract: each term is ratio→ln→product (one correctly
    * rounded IEEE op per step in both engines), the averages floor-round
    * at 1e-6 ([[graft.util.Partitioning.stableRound6]] — floor cannot
    * emit −0.0, which matters because GK and RS can go negative), and
    * the two non-dyadic constants ride to the oracle as string-cast
    * doubles.
    *
    * Scale shape: one hash aggregate over the (already tiny) candle
    * frame — partial map-side, single exchange on the group keys.
    */
  def rangeVolatility(
      candles: DataFrame, openCol: String, highCol: String, lowCol: String,
      closeCol: String, groupCols: Seq[String]): DataFrame = {
    val o = col(openCol); val h = col(highCol); val l = col(lowCol); val c = col(closeCol)
    val lhl = log(h / l)
    val lco = log(c / o)
    candles.filter(l > 0)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_bars"),
        sr6(avg(lhl * lhl) / lit(ParkinsonDenom)).as("parkinson"),
        sr6(avg(lit(0.5) * lhl * lhl - lit(GarmanKlassC) * lco * lco)).as("garman_klass"),
        sr6(avg(log(h / c) * log(h / o) + log(l / c) * log(l / o))).as("rogers_satchell"))
  }

  /** Sample autocorrelation of `valueCol` at each of `lags` per series —
    * the memory/mean-reversion diagnostic behind every momentum vs
    * mean-reversion call (and the order-flow persistence read when fed
    * signed flow). ACF(ℓ) here is the Pearson correlation of the ALIGNED
    * pairs (x_t, x_{t−ℓ}) — the regression convention (two means, two
    * variances over the overlap), not the Box–Jenkins single-mean
    * estimator; chosen because `corr` is a portable SQL aggregate with
    * identical pair-null semantics in both engines (rows whose lag is
    * null — the first ℓ of each series — drop out of that lag's
    * aggregate only).
    *
    * Output: one row per series, `n` plus one `acf_ℓ` column per lag
    * (wide — the lag set is a compile-time parameter list, not data).
    * Null when the overlap has < 2 rows or either side is constant.
    *
    * Scale shape: all lag columns ride ONE Window node (same spec →
    * Catalyst collapses them into a single sort pass), then one
    * hash aggregate. A million series = a million independent window
    * groups; nothing global.
    */
  def autocorrelation(
      df: DataFrame, valueCol: String,
      partition: Seq[String], order: Seq[String], lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"lags must be >= 1: $lags")
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
    val withLags = lags.foldLeft(df) { (d, l) =>
      d.withColumn(s"__lag_$l", lag(col(valueCol), l).over(w))
    }
    // Built from guarded covar_samp/stddev_samp components rather than
    // corr(): under ANSI mode Spark's corr THROWS (divide-by-zero) on a
    // constant side, where the SQL convention — and DuckDB's corr — is
    // NULL. The stddevs are restricted to the ALIGNED pairs (rows whose
    // lag exists), matching corr's pairwise semantics exactly.
    val x = col(valueCol)
    val compAggs = lags.flatMap { l =>
      val lg = col(s"__lag_$l")
      Seq(
        covar_samp(x, lg).as(s"__c_$l"),
        stddev_samp(when(lg.isNotNull, x)).as(s"__sx_$l"),
        stddev_samp(when(x.isNotNull, lg)).as(s"__sl_$l"))
    }
    val aggs = count(x).as("n") +: compAggs
    val g = withLags.groupBy(partition.map(col): _*).agg(aggs.head, aggs.tail: _*)
    def bad(c: Column): Column = c.isNull || c.isNaN || c === 0.0
    lags.foldLeft(g) { (d, l) =>
      val c = col(s"__c_$l"); val sx = col(s"__sx_$l"); val sl = col(s"__sl_$l")
      d.withColumn(s"acf_$l",
        when(bad(sx) || bad(sl) || c.isNull || c.isNaN, lit(null).cast("double"))
          .otherwise(sr6(c / (sx * sl))))
    }.drop(lags.flatMap(l => Seq(s"__c_$l", s"__sx_$l", s"__sl_$l")): _*)
  }

  /** Lo–MacKinlay variance-ratio statistic per series: VR(q) =
    * Var(x_t − x_{t−q}) / (q · Var(x_t − x_{t−1})) over OVERLAPPING
    * q-period differences — the canonical random-walk test (VR ≈ 1 under
    * a random walk; > 1 momentum, < 1 mean reversion). This is the
    * plain sample-variance form (var_samp on both diffs, no
    * heteroscedasticity correction — documented, portable); the z
    * statistic ships under the homoscedastic null:
    * z = (VR − 1) · √(3 q n / (2 (2q − 1)(q − 1))).
    *
    * Null when either diff population has < 2 rows or the 1-period
    * variance is 0 (a constant series has no random-walk question).
    *
    * Scale shape: both lag columns in one Window node (one sort per
    * series), one hash aggregate; z is a scalar projection over the
    * per-series row.
    */
  def varianceRatio(
      df: DataFrame, valueCol: String,
      partition: Seq[String], order: Seq[String], q: Int): DataFrame = {
    require(q >= 2, s"variance ratio needs q >= 2, got $q")
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
    val d1 = col(valueCol) - lag(col(valueCol), 1).over(w)
    val dq = col(valueCol) - lag(col(valueCol), q).over(w)
    val g = df.withColumn("__d1", d1).withColumn("__dq", dq)
      .groupBy(partition.map(col): _*)
      .agg(
        count(col("__dq")).as("n_q"),
        var_samp(col("__d1")).as("__v1"),
        var_samp(col("__dq")).as("__vq"))
    // var_samp is NaN at n = 1 in Spark but NULL in SQL engines — fold
    // NaN into the null guard alongside the zero-variance case.
    val vr = when(col("__v1").isNull || col("__v1").isNaN || col("__v1") === 0.0 ||
          col("__vq").isNull || col("__vq").isNaN,
        lit(null).cast("double"))
      .otherwise(col("__vq") / (lit(q.toDouble) * col("__v1")))
    g.withColumn("__vr", vr)
      .withColumn("vr", sr6(col("__vr")))
      .withColumn("z_stat",
        sr6((col("__vr") - 1.0) *
          sqrt(lit(3.0 * q) * col("n_q") / lit(2.0 * (2 * q - 1) * (q - 1)))))
      .drop("__v1", "__vq", "__vr")
  }

  /** ROLLING OLS BETA of `xCol` on `yCol` over the trailing `n` rows —
    * the pairs-trading hedge ratio / time-varying market beta (the
    * rolling twin of [[betaToBenchmark]]). Built from raw window sums,
    * NOT windowed covar/corr aggregates: window expressions evaluate
    * unconditionally, and the moment aggregates divide internally —
    * a 1-row head frame would throw under ANSI where the SQL answer is
    * NULL. With plain sums the division happens once, in the guarded
    * projection: β = (nΣxy − ΣxΣy)/(nΣy² − (Σy)²), null when the
    * pairwise count < 2 or the benchmark has no variance in the frame.
    *
    * Pairwise semantics: rows missing either side drop out of every
    * sum (the corr convention). One Window node carries all five
    * sums — one sort per series.
    */
  def rollingBeta(
      df: DataFrame, xCol: String, yCol: String, out: String,
      partition: Seq[String], order: Seq[String], n: Int): DataFrame = {
    require(n >= 2, s"rollingBeta needs n >= 2, got $n")
    val frame = Window.partitionBy(partition.map(col): _*)
      .orderBy(order.map(col): _*).rowsBetween(-(n - 1), 0)
    val both = col(xCol).isNotNull && col(yCol).isNotNull
    val px = when(both, col(xCol))
    val py = when(both, col(yCol))
    val cnt = count(px).over(frame).cast("double")
    val sx = sum(px).over(frame)
    val sy = sum(py).over(frame)
    val sxy = sum(when(both, col(xCol) * col(yCol))).over(frame)
    val syy = sum(when(both, col(yCol) * col(yCol))).over(frame)
    df.withColumn("__n", cnt)
      .withColumn("__sx", sx).withColumn("__sy", sy)
      .withColumn("__sxy", sxy).withColumn("__syy", syy)
      .withColumn(out, {
        val den = col("__n") * col("__syy") - col("__sy") * col("__sy")
        when(col("__n") < 2.0 || den <= 0.0, lit(null).cast("double"))
          .otherwise(sr6((col("__n") * col("__sxy") - col("__sx") * col("__sy"))
            / den + lit(0.0)))
      })
      .drop("__n", "__sx", "__sy", "__sxy", "__syy")
  }

  /** The lag set and regression constants of [[hurstExponent]] — public
    * so the oracle states the identical string-cast literals.
    */
  val HurstLags: Seq[Int] = Seq(2, 4, 8, 16)
  val HurstX: Seq[Double] = HurstLags.map(q => math.log(q.toDouble))
  val HurstSumX: Double = ((HurstX(0) + HurstX(1)) + HurstX(2)) + HurstX(3)
  val HurstDenom: Double = {
    val sxx = ((HurstX(0) * HurstX(0) + HurstX(1) * HurstX(1))
      + HurstX(2) * HurstX(2)) + HurstX(3) * HurstX(3)
    4.0 * sxx - HurstSumX * HurstSumX
  }

  /** HURST EXPONENT per series, estimated from the variance-ratio
    * scaling law VR(q) ∝ q^(2H−1) (Lo 1991's framing of aggregated
    * variance): compute VR at q ∈ {2, 4, 8, 16}, regress ln VR(q) on
    * ln q (closed-form least squares over the four points — the x side
    * is constant, so slope = (4·Σxy − Σx·Σy)/HurstDenom with both x
    * constants driver-computed), and read H = (1 + slope)/2. H ≈ 0.5
    * random walk, > 0.5 trending/persistent, < 0.5 mean-reverting.
    *
    * Null when any VR is unavailable or non-positive (short/constant
    * series — the log has nothing to regress). The four `vr_q` columns
    * ship alongside H for inspection.
    *
    * Scale shape: five lag columns in ONE Window node (one sort per
    * series), one hash aggregate, then pure projection arithmetic in a
    * pinned association order — the regression never leaves the row.
    */
  def hurstExponent(
      df: DataFrame, valueCol: String,
      partition: Seq[String], order: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
    val withLags = (1 +: HurstLags).foldLeft(df) { (d, l) =>
      d.withColumn(s"__d_$l", col(valueCol) - lag(col(valueCol), l).over(w))
    }
    val aggs = count(col(s"__d_${HurstLags.max}")).as("n_q") +:
      (1 +: HurstLags).map(l => var_samp(col(s"__d_$l")).as(s"__v_$l"))
    val g = withLags.groupBy(partition.map(col): _*).agg(aggs.head, aggs.tail: _*)
    def bad(c: Column): Column = c.isNull || c.isNaN
    val v1 = col("__v_1")
    val vrs = HurstLags.map { q =>
      q -> when(bad(v1) || v1 === 0.0 || bad(col(s"__v_$q")),
        lit(null).cast("double"))
        .otherwise(col(s"__v_$q") / (lit(q.toDouble) * v1))
    }
    val withVr = vrs.foldLeft(g) { case (d, (q, c)) => d.withColumn(s"__vr_$q", c) }
    val anyBad = vrs.map { case (q, _) =>
      col(s"__vr_$q").isNull || col(s"__vr_$q") <= 0.0
    }.reduce(_ || _)
    val ys = HurstLags.map(q => log(col(s"__vr_$q")))
    val sy = ((ys(0) + ys(1)) + ys(2)) + ys(3)
    val sxy = ((lit(HurstX(0)) * ys(0) + lit(HurstX(1)) * ys(1))
      + lit(HurstX(2)) * ys(2)) + lit(HurstX(3)) * ys(3)
    val slope = (lit(4.0) * sxy - lit(HurstSumX) * sy) / lit(HurstDenom)
    val out = withVr
      .withColumn("hurst",
        when(anyBad, lit(null).cast("double"))
          .otherwise(sr6((lit(1.0) + slope) / 2.0)))
    HurstLags.foldLeft(out) { (d, q) =>
      d.withColumn(s"vr_$q", sr6(col(s"__vr_$q")))
    }.drop(((1 +: HurstLags).map(l => s"__v_$l") ++ HurstLags.map(q => s"__vr_$q")): _*)
  }

  /** NEWEY–WEST autocorrelation-robust t-statistic of the series mean:
    * is the average return distinguishable from zero once serial
    * correlation is priced in? The long-run variance is
    * γ₀ + 2·Σⱼ (1 − j/(L+1))·γⱼ (Bartlett kernel), with
    * γⱼ = (1/n)·Σ_{t>j} (x_t − μ)(x_{t−j} − μ) over the aligned pairs
    * and μ the FULL-sample mean (the standard estimator). Emits per
    * series: n, the mean, the iid t (μ/√(γ₀/n)) and the NW t
    * (μ/√(lrv/n)) — positive autocorrelation deflates t_nw below
    * t_iid, the classic overlapping-returns correction.
    *
    * Each γⱼ expands to pair sums the one hash aggregate collects
    * (Σx·xⱼ, Σx, Σxⱼ, count over the overlap): γⱼ =
    * (sxyⱼ − μ·(sxⱼ + syⱼ) + nⱼ·μ²)/n. Bartlett weights are the same
    * IEEE expression (1 − j/(L+1)) both engines. Null t when the
    * variance side degenerates (constant series, n ≤ L, or a
    * non-positive long-run variance — possible in sample, guarded).
    * Moment sums accumulate in engine order → sr6 at emission.
    *
    * Scale shape: all L lag columns ride ONE Window node (one sort per
    * series), then one hash aggregate — the q167/q168 plan shape.
    */
  def neweyWestTStat(
      df: DataFrame, valueCol: String,
      partition: Seq[String], order: Seq[String], maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
    val lags = 1 to maxLag
    val withLags = lags.foldLeft(df) { (d, l) =>
      d.withColumn(s"__lag_$l", lag(col(valueCol), l).over(w))
    }
    val x = col(valueCol)
    val pairAggs = lags.flatMap { l =>
      val lg = col(s"__lag_$l")
      Seq(
        sum(x * lg).as(s"__sxy_$l"),
        sum(when(lg.isNotNull, x)).as(s"__sx_$l"),
        sum(when(x.isNotNull, lg)).as(s"__sy_$l"),
        count(when(x.isNotNull, lg)).as(s"__np_$l"))
    }
    val aggs = Seq(
      count(x).as("n"), avg(x).as("__mu"),
      sum(x * x).as("__sxx")) ++ pairAggs
    val g = withLags.groupBy(partition.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val n = col("n").cast("double")
    val mu = col("__mu")
    // gamma_0 = (sum x^2 - n mu^2) / n
    val g0 = (col("__sxx") - n * (mu * mu)) / n
    val gammas = lags.map { l =>
      val sxy = col(s"__sxy_$l"); val sx = col(s"__sx_$l")
      val sy = col(s"__sy_$l"); val np = col(s"__np_$l").cast("double")
      l -> ((sxy - mu * (sx + sy) + np * (mu * mu)) / n)
    }
    val lrv = gammas.foldLeft(g0) { case (acc, (l, gl)) =>
      acc + lit(2.0) * lit(1.0 - l.toDouble / (maxLag + 1).toDouble) * gl
    }
    g.select(
      (partition.map(col) ++ Seq(
        col("n"),
        sr6(mu + lit(0.0)).as("mean"),
        when(col("n") <= maxLag || !(g0 > 0.0), lit(null).cast("double"))
          .otherwise(sr6(mu / sqrt(g0 / n) + lit(0.0))).as("t_iid"),
        when(col("n") <= maxLag || !(lrv > 0.0), lit(null).cast("double"))
          .otherwise(sr6(mu / sqrt(lrv / n) + lit(0.0))).as("t_nw"))): _*)
  }
}
