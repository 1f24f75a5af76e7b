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

  /** DETERMINISTIC block-bootstrap confidence interval for a SHARPE
    * ratio: resample the return series in non-overlapping blocks of
    * `blockLen` (dependence-preserving), `nResamples` replicates, and
    * read the CI off the exact interpolated percentiles of the
    * replicate Sharpes — "is the Sharpe real" with serial correlation
    * respected. The trailing partial block is dropped (documented
    * standard simplification).
    *
    * Randomness is HASH-DERIVED, not drawn: replicate b's k-th draw is
    * block ⌊u·nblocks⌋ with u the md5-uniform of "b:k" (the q67/X13
    * id-hash convention) — a pure function of (b, k), so the entire
    * bootstrap is reproducible cross-engine and cross-run with no seed
    * state. Replicate moments accumulate in engine order → sr6 at
    * emission; the percentile is the exact interpolated q33/q58
    * contract over the replicate Sharpes.
    *
    * Scale shape: the caller collapses to a periods-long return series
    * FIRST (ticks never reach this operator); the draw grid is
    * nResamples × nblocks rows over that tiny frame — independent of
    * tick volume — and the block join is an equi-join on the block id.
    */
  def bootstrapSharpe(
      df: DataFrame, valueCol: String, orderCol: String,
      blockLen: Int = 5, nResamples: Int = 200): DataFrame = {
    require(blockLen >= 1 && nResamples >= 10,
      s"need blockLen >= 1 and nResamples >= 10, got $blockLen/$nResamples")
    val wAll = Window.orderBy(col(orderCol))
    val indexed = df
      .withColumn("__i", row_number().over(wAll).cast("long"))
      .withColumn("__blk", ((col("__i") - 1L) / lit(blockLen.toLong)).cast("long"))
      .select(col("__blk"), col(valueCol).cast("double").as("__r"))
    val meta = indexed.groupBy(col("__blk")).agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") === blockLen) // complete blocks only
      .agg(count(lit(1)).as("n_blocks"))
    val complete = indexed
      .crossJoin(broadcast(meta))
      .filter(col("__blk") < col("n_blocks"))
    val point = complete
      .agg(count(lit(1)).as("n_days"), avg(col("__r")).as("__m"),
        stddev_samp(col("__r")).as("__s"))
      .select(col("n_days"),
        when(col("n_days") < 2 || col("__s").isNaN || col("__s") === 0.0,
          lit(null).cast("double"))
          .otherwise(sr6(col("__m") / col("__s") + lit(0.0))).as("sharpe"))
    val u = conv(substring(md5(
      concat(col("__b").cast("string"), lit(":"), col("__k").cast("string"))),
      1, 15), 16, 10).cast("long").cast("double") / lit(1152921504606846976.0d)
    // n_blocks = 0 (input shorter than one block) must yield an empty
    // draw grid: sequence(1, 0) is the DESCENDING [1, 0] in Spark, which
    // would fabricate draw rows pointing at blocks that don't exist
    val draws = meta.filter(col("n_blocks") >= 1L)
      .select(explode(sequence(lit(1), lit(nResamples))).as("__b"), col("n_blocks"))
      .select(col("__b"), explode(sequence(lit(1L), col("n_blocks"))).as("__k"),
        col("n_blocks"))
      .withColumn("__blk", floor(u * col("n_blocks").cast("double")).cast("long"))
      .select(col("__b"), col("__blk"))
    val reps = draws.join(complete.select(col("__blk"), col("__r")), Seq("__blk"))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__rn"), avg(col("__r")).as("__rm"),
        stddev_samp(col("__r")).as("__rs"))
      .select(col("__b"),
        when(col("__rn") < 2 || col("__rs").isNaN || col("__rs") === 0.0,
          lit(null).cast("double"))
          .otherwise(col("__rm") / col("__rs")).as("__sh"))
    val ci = reps.agg(
      count(col("__sh")).as("b_resamples"),
      sr6(percentile(col("__sh"), lit(0.025)) + lit(0.0)).as("ci_lo"),
      sr6(percentile(col("__sh"), lit(0.975)) + lit(0.0)).as("ci_hi"))
    point.crossJoin(broadcast(meta)).crossJoin(broadcast(ci))
      .select("n_days", "n_blocks", "sharpe", "b_resamples", "ci_lo", "ci_hi")
  }

  /** INVERSE-VOLATILITY (naive risk parity) portfolio construction
    * over a keyed period-close frame: per series the return volatility,
    * the weight wᵢ ∝ 1/σᵢ, and the resulting portfolio's realized
    * volatility — the simplest risk-balanced book and the standard
    * benchmark against equal weight. Emits one row per series: n_rets,
    * vol, weight, port_vol (the portfolio column repeats per row).
    *
    * Determinism: σᵢ rounds (sr6) BEFORE inversion; 1/σᵢ then
    * quantizes to exact MICRO-UNIT BIGINTs, so the normalizing sum is
    * order-free integer arithmetic and every weight is the identical
    * double ratio in both engines. The realized portfolio volatility
    * is var over the per-period weighted sums on COMPLETE periods only
    * (periods where every series has a return — a partial period would
    * make the book's weights lie); those aggregates accumulate in
    * engine order → sr6 at emission. Zero/degenerate σ (constant
    * series) excludes the series from the book: its weight is null and
    * the remaining weights renormalize by construction.
    *
    * Scale shape: everything rides the keys×periods close frame — one
    * per-key window for returns, one keys-row vol aggregate, one
    * broadcast of the (tiny) weight table back onto the return frame,
    * one per-period sum. Nothing touches raw ticks.
    */
  def riskParity(
      df: DataFrame, keyCol: String, timeCol: String,
      closeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
    val lagC = lag(col(closeCol), 1).over(w)
    val rets = df
      .withColumn("__r",
        when(lagC === 0.0, lit(null).cast("double"))
          .otherwise(col(closeCol) / lagC - 1.0))
      .filter(col("__r").isNotNull)
      .select(col(keyCol), col(timeCol), col("__r"))
    val vols = rets.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rets"), stddev_samp(col("__r")).as("__sd"))
      .withColumn("vol",
        when(col("n_rets") < 2 || col("__sd").isNaN || col("__sd") <= 0.0,
          lit(null).cast("double"))
          .otherwise(sr6(col("__sd") + lit(0.0))))
      .withColumn("__inv_micro",
        when(col("vol").isNotNull,
          floor(lit(1.0) / col("vol") * lit(1000000d) + lit(0.5d)).cast("long")))
    val wAll = Window.partitionBy()
    val weighted = vols
      .withColumn("__tot_inv", sum(col("__inv_micro")).over(wAll))
      .withColumn("weight",
        when(col("__inv_micro").isNotNull,
          col("__inv_micro").cast("double") / col("__tot_inv").cast("double")))
    val nBook = weighted.filter(col("weight").isNotNull)
      .select(count(lit(1)).as("__n_book"))
    val port = rets
      .join(broadcast(weighted.select(col(keyCol), col("weight")))
        .filter(col("weight").isNotNull), Seq(keyCol))
      .groupBy(col(timeCol))
      .agg(sum(col("weight") * col("__r")).as("__pr"),
        count(lit(1)).as("__np"))
      .crossJoin(broadcast(nBook))
      .filter(col("__np") === col("__n_book"))
      .agg(stddev_samp(col("__pr")).as("__psd"))
      .select(sr6(col("__psd") + lit(0.0)).as("port_vol"))
    weighted.crossJoin(broadcast(port))
      .select(keyCol, "n_rets", "vol", "weight", "port_vol")
  }

  /** Equal-weight PORTFOLIO RISK DECOMPOSITION over a keyed
    * period-close frame: the full return covariance matrix (pairwise,
    * time-aligned), portfolio variance wᵀΣw, each series' MARGINAL
    * contribution to risk (Σw)ᵢ/σₚ · wᵢ and its RISK SHARE — the
    * numbers a risk report attributes portfolio volatility with (risk
    * shares sum to 1). Emits one row per series: n_keys, var_p, mcr,
    * risk_share.
    *
    * Determinism: each covariance entry quantizes to exact PICO-UNITS
    * (×10¹² BIGINT) the moment it leaves the aggregate, so every
    * row-sum and the grand total are order-free integer arithmetic and
    * var_p / mcr / risk_share are computed from identical doubles in
    * identical expression order — NO rounding at emission (the q188
    * micro-unit idea, three more digits because return covariances sit
    * at 1e-4 scale). Pairs with fewer than two common periods have a
    * null covariance and contribute ZERO (both engines' sum skips
    * nulls); a pair with no overlap at all contributes no row — the
    * operator assumes a shared calendar, which the caller's period
    * frame provides.
    *
    * Scale shape: the pair cross touches only the keys×periods close
    * frame (the q187 discipline); the matrix, row sums, and the
    * single-partition total all live on keys²-row frames — trivial
    * beside the tick collapse the caller already did. Past thousands
    * of keys, block the matrix (factor-model or sector blocks) before
    * this screen.
    */
  def riskContributions(
      df: DataFrame, keyCol: String, timeCol: String,
      closeCol: String, blocks: Option[DataFrame] = None): DataFrame = {
    // `blocks` (a (key, block) frame — sector map or
    // Pairs.blockedPairSource): decompose PER BLOCK instead of one
    // global book — the |keys|² covariance cross becomes Σ|block|²
    // within-block entries (the X74 scale path), and each block is its
    // own equal-weight sub-portfolio (sector risk buckets). Keys absent
    // from `blocks` are excluded, the Pairs contract. Output gains the
    // block column in that mode; RiskSpec pins blocked ≡ per-block runs.
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
    val lagC = lag(col(closeCol), 1).over(w)
    val rets = df
      .withColumn("__r",
        when(lagC === 0.0, lit(null).cast("double"))
          .otherwise(col(closeCol) / lagC - 1.0))
      .filter(col("__r").isNotNull)
      .select(col(keyCol), col(timeCol), col("__r"))
    val a = rets.select(col(keyCol).as("__ki"), col(timeCol).as("__t"),
      col("__r").as("__ri"))
    val b = rets.select(col(keyCol).as("__kj"), col(timeCol).as("__t"),
      col("__r").as("__rj"))
    val (aJ, bJ, joinKeys, blockCols) = blocks match {
      case None => (a, b, Seq("__t"), Seq.empty[String])
      case Some(bl0) =>
        require(bl0.columns.length == 2,
          s"blocks must be a two-column (key, block) frame — got " +
            s"(${bl0.columns.mkString(", ")}); select the two columns first")
        val Seq(bk, bb) = bl0.columns.toSeq
        // keys must map to ONE block (r12 advice): a duplicated key
        // would duplicate its covariance rows and the per-block sums
        // would silently merge across blocks — same in-plan loud guard
        // as Pairs.pairCross
        val bl = graft.util.Guards.requireUniquePerKey(
          bl0, Seq(bk), "riskContributions blocks frame")
        val b1 = broadcast(bl.select(col(bk).as("__ki"), col(bb).as("pair_block")))
        val b2 = broadcast(bl.select(col(bk).as("__kj"), col(bb).as("pair_block")))
        (a.join(b1, Seq("__ki")), b.join(b2, Seq("__kj")),
          Seq("__t", "pair_block"), Seq("pair_block"))
    }
    val cov = aJ.join(bJ, joinKeys)
      .groupBy((blockCols.map(col) :+ col("__ki")) :+ col("__kj"): _*)
      .agg(covar_samp(col("__ri"), col("__rj")).as("__c"))
      .withColumn("__cp",
        floor(col("__c") * lit(1.0e12) + lit(0.5d)).cast("long"))
    val rows = cov.groupBy(blockCols.map(col) :+ col("__ki").as(keyCol): _*)
      .agg(sum(col("__cp")).as("__rs"), count(lit(1)).as("__nk"))
    val wAll = Window.partitionBy(blockCols.map(col): _*)
    val nkSq = (col("__nk") * col("__nk")).cast("double")
    val varP = (col("__tot").cast("double") / lit(1.0e12)) / nkSq
    rows
      .withColumn("__tot", sum(col("__rs")).over(wAll))
      .withColumn("n_keys", col("__nk"))
      .withColumn("var_p", varP)
      .withColumn("mcr",
        when(varP > 0.0,
          ((col("__rs").cast("double") / lit(1.0e12)) / nkSq) / sqrt(varP))
          .otherwise(lit(null).cast("double")))
      .withColumn("risk_share",
        when(col("__tot") =!= 0L,
          col("__rs").cast("double") / col("__tot").cast("double"))
          .otherwise(lit(null).cast("double")))
      .select((blockCols ++ Seq(keyCol, "n_keys", "var_p", "mcr", "risk_share"))
        .map(col): _*)
  }
}
