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
    * Mechanics: the guard rides EVERY column — any key group with
    * count > 1 turns each column into `raise_error`, which fires the
    * moment the plan executes. Wrapping only one column was a latent
    * pruning hazard (r13 advice): if a caller never referenced that
    * particular column downstream, Catalyst column pruning removed
    * the guarded projection (and its Window) and silently disabled
    * the check; with every column guarded, the guard survives as long
    * as the caller consumes ANY column of the frame — and a frame
    * with no consumed columns has nothing to corrupt. `raise_error`
    * is NullType and coerces to each guarded column's type.
    */
  def requireUniquePerKey(
      df: DataFrame, keyCols: Seq[String], context: String): DataFrame = {
    require(keyCols.nonEmpty && keyCols.forall(df.columns.contains),
      s"$context: key columns ${keyCols.mkString(", ")} must exist in " +
        s"(${df.columns.mkString(", ")})")
    val w = Window.partitionBy(keyCols.map(col): _*)
    val msg = format_string(
      s"$context: key (%s) maps to %s rows — (${keyCols.mkString(", ")}) " +
        "must be unique (duplicates would silently multiply downstream " +
        "per-key rows); dedup the frame before passing it",
      concat_ws(",", keyCols.map(c => col(c).cast("string")): _*),
      col("__dup_n").cast("string"))
    val withN = df.withColumn("__dup_n", count(lit(1)).over(w))
    df.columns.foldLeft(withN) { (d, c) =>
      d.withColumn(c,
        when(col("__dup_n") > 1L, raise_error(msg).cast(df.schema(c).dataType))
          .otherwise(col(c)))
    }.drop("__dup_n")
  }
}
