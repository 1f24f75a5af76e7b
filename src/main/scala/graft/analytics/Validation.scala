package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-ordered cross-validation splits for financial ML — the
  * backtest-hygiene side of the reference's serving data (SURVEY §2.4/W
  * adjacent; the same leakage concern [[graft.llmops.Sampling
  * .groupAwareSplit]] addresses for near-duplicate text, transposed to
  * the time axis).
  *
  * A plain k-fold over a financial series leaks: labels are built from
  * FORWARD returns, so a training row whose label horizon overlaps the
  * test fold has seen test-period information. The standard remedy
  * (López de Prado, *Advances in Financial Machine Learning* ch. 7 —
  * public methodology) is PURGING: for each test fold, drop training
  * rows within an embargo margin of the fold's boundaries.
  */
object Validation {

  /** Purged k-fold assignment summary over a time column: the span
    * [min ts, max ts] is cut into `k` equal contiguous folds; for each
    * fold used as the test set, training rows within `embargoSeconds`
    * of the fold's boundaries (the tail of the previous fold and the
    * head of the next) are PURGED rather than trained on.
    *
    * Returns exactly `k` rows: (fold, n_test, n_purged, n_train) with
    * n_test + n_purged + n_train = total for every fold.
    *
    * Boundary-crossing bookkeeping is ±1-fold: a row is purged for test
    * fold f iff it sits in fold f±1 within the embargo of the shared
    * boundary. That accounting is only complete while the embargo is
    * smaller than a fold's width, so an in-plan guard fails the job
    * loudly when k·(embargo+1) exceeds the observed span — a silent
    * undercount of purged rows would overstate the training set, the
    * exact bug this operator exists to prevent.
    *
    * Determinism contract: fold ids come from exact BIGINT epoch-micros
    * arithmetic with ONE correctly-rounded double division
    * (floor((e−mn)·k / span)), so the oracle reproduces every
    * assignment bit-identically.
    *
    * Scale shape: one pass over the data computing three codegen'd fold
    * expressions, one hash aggregate to k rows, then lag/lead over the
    * k-row frame — the corpus never shuffles beyond the aggregate's
    * partial-combine exchange. The span bounds ride in via a broadcast
    * 1-row cross join (no driver collect).
    */
  def purgedTimeFolds(
      df: DataFrame, tsCol: String, k: Int, embargoSeconds: Long): DataFrame = {
    val ord = Window.orderBy(col("fold"))
    val all = Window.partitionBy()
    sliceCounts(df, tsCol, k, embargoSeconds, "purgedTimeFolds")
      .withColumn("__tot", sum(col("n_test")).over(all))
      .withColumn("n_purged",
        coalesce(lag(col("__nhi"), 1).over(ord), lit(0L)) +
          coalesce(lead(col("__nlo"), 1).over(ord), lit(0L)))
      .withColumn("n_train", col("__tot") - col("n_test") - col("n_purged"))
      .select(col("fold"), col("n_test"), col("n_purged"), col("n_train"))
  }

  /** Walk-forward (anchored expanding-window) splits — the OTHER standard
    * backtest protocol: fold f (1..k-1) tests on slice f and trains on
    * everything strictly BEFORE it, minus the embargo tail of slice f−1
    * (the same leakage channel [[purgedTimeFolds]] purges, one-sided
    * here because the future is never trained on at all). Slice 0 only
    * ever trains, so k slices yield k−1 rows:
    * (fold, n_test, n_purged, n_train) with n_train + n_purged = all
    * rows before the test slice.
    *
    * Same determinism contract, guard, and one-scan scale shape as
    * [[purgedTimeFolds]].
    */
  def walkForwardFolds(
      df: DataFrame, tsCol: String, k: Int, embargoSeconds: Long): DataFrame = {
    val ord = Window.orderBy(col("fold"))
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    sliceCounts(df, tsCol, k, embargoSeconds, "walkForwardFolds")
      .withColumn("__cum", coalesce(sum(col("n_test")).over(before), lit(0L)))
      .withColumn("n_purged", coalesce(lag(col("__nhi"), 1).over(ord), lit(0L)))
      .withColumn("n_train", col("__cum") - col("n_purged"))
      .filter(col("fold") >= 1)
      .select(col("fold"), col("n_test"), col("n_purged"), col("n_train"))
  }

  /** Shared slice machinery: per-slice row counts plus the two embargo
    * boundary flags, joined onto a k-row spine (an empty middle slice
    * must not shift the fold window arithmetic). Output:
    * (fold, n_test, __nhi, __nlo) — __nhi rows sit within the embargo
    * BEFORE the next boundary, __nlo within the embargo AFTER the
    * previous one.
    */
  private def sliceCounts(
      df: DataFrame, tsCol: String, k: Int, embargoSeconds: Long,
      op: String): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(embargoSeconds >= 0, s"embargoSeconds must be >= 0, got $embargoSeconds")
    val embargoUs = embargoSeconds * 1000000L
    val e = unix_micros(col(tsCol))
    val bounds0 = df.agg(min(e).as("__mn"), max(e).as("__mx"))
    // guard: embargo must fit inside one fold or ±1 accounting undercounts
    val spanL = col("__mx") - col("__mn") + 1L
    val bounds = bounds0.select(
      when(lit(k.toLong) * (embargoUs + 1L) > spanL,
        raise_error(concat(
          lit(s"$op: embargo ($embargoSeconds s) is not smaller than a "),
          lit(s"fold's width (span "), spanL.cast("string"),
          lit(s" us / k=$k) — purged rows two folds away would be silently " +
            "counted as training data. Use fewer folds or a shorter embargo."))))
        .otherwise(col("__mn")).as("__mn"),
      col("__mx"))
    val rows = df.select(e.as("__e")).crossJoin(broadcast(bounds))
    val span = (col("__mx") - col("__mn") + 1L).cast("double")
    def foldOf(t: Column): Column =
      least(floor((t - col("__mn")).cast("double") * k / span), lit((k - 1).toDouble))
        .cast("int")
    val g = foldOf(col("__e"))
    // within embargo BEFORE the next boundary → purged when fold g+1 tests
    val hi = (foldOf(col("__e") + embargoUs) > g) && (g < k - 1)
    // within embargo AFTER the previous boundary → purged when g-1 tests
    val lo = (foldOf(col("__e") - embargoUs) < g) && (g > 0)
    val perFold = rows
      .select(g.as("fold"), hi.cast("long").as("__hi"), lo.cast("long").as("__lo"))
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_test"), sum(col("__hi")).as("__nhi"),
        sum(col("__lo")).as("__nlo"))
    val spine = df.sparkSession.range(k).select(col("id").cast("int").as("fold"))
    spine.join(perFold, Seq("fold"), "left")
      .select(col("fold"),
        coalesce(col("n_test"), lit(0L)).as("n_test"),
        coalesce(col("__nhi"), lit(0L)).as("__nhi"),
        coalesce(col("__nlo"), lit(0L)).as("__nlo"))
  }
}
