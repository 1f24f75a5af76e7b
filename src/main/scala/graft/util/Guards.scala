package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-plan loud-failure guards — the house convention (volumeBarFold's
  * magnitude `require`, zScoreFold's `Math.addExact`) extended to
  * DataFrame-shaped contracts that can't be checked at call time
  * without forcing an eager action on the caller's (lazy) plan.
  */
object Guards {

  /** Fail LOUDLY (named message, not silent corruption) if any key
    * group in `df` has more than one row — evaluated IN-PLAN, so the
    * caller's laziness is preserved and the check costs one Window
    * over the (small) frame it protects. Used on broadcast-side
    * contract frames: a pair screen's (key, block) map (r12 advice:
    * a key in two blocks duplicates its pair rows and the downstream
    * groupBy silently merges across blocks) and a backtest's screened
    * (k1, k2) frame (duplicate pairs double-count P&L within each
    * carried-column group).
    *
    * Mechanics: the guard is a FILTER over the per-key window count —
    * a row in a key group with count > 1 evaluates `raise_error`
    * inside the filter predicate, which fires the moment the plan
    * executes. A filter is immune to the column-pruning hazard that
    * killed the r12 single-column-projection form (Catalyst removes
    * unused projection columns, never filter predicates) AND, unlike
    * the r13 wrap-every-column form, it preserves the frame's
    * attribute identities — so the window's hash partitioning on the
    * key columns propagates to downstream joins/aggregates on the
    * same keys instead of forcing a second exchange (the r15 q230
    * plan-audit finding). Strictly stronger than the projection form:
    * it fires even when a caller consumes no column of the frame.
    */
  def requireUniquePerKey(
      df: DataFrame, keyCols: Seq[String], context: String): DataFrame = {
    require(keyCols.nonEmpty && keyCols.forall(df.columns.contains),
      s"$context: key columns ${keyCols.mkString(", ")} must exist in " +
        s"(${df.columns.mkString(", ")})")
    val w = Window.partitionBy(keyCols.map(col): _*)
    val dupN = count(lit(1)).over(w)
    val msg = format_string(
      s"$context: key (%s) maps to %s rows — (${keyCols.mkString(", ")}) " +
        "must be unique (duplicates would silently multiply downstream " +
        "per-key rows); dedup the frame before passing it",
      concat_ws(",", keyCols.map(c => col(c).cast("string")): _*),
      col("__dup_n").cast("string"))
    df.withColumn("__dup_n", dupN)
      .filter(when(col("__dup_n") > 1L, raise_error(msg).cast("boolean"))
        .otherwise(lit(true)))
      .drop("__dup_n")
  }
}
