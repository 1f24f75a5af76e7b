package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label construction for financial ML — the step between the served
  * series (SURVEY §2.4/§2.5) and a training set, companion to
  * [[Validation]]'s split hygiene (the labels built here are exactly why
  * purging/embargo exist: they look FORWARD).
  */
object Labeling {

  /** Triple-barrier labels (López de Prado, *Advances in Financial
    * Machine Learning* ch. 3 — public methodology): for each observation,
    * look at the next `horizon` rows of the series; the label is the
    * FIRST barrier touched —
    *
    *   +1  value rises to ≥ v·(1+up)   (profit-take),
    *   −1  value falls to ≤ v·(1−down) (stop-loss),
    *    0  neither within the horizon  (the vertical barrier).
    *
    * Output adds `label` and `t_touch` (1-based position of the touch
    * within the forward window; null at the vertical barrier). Rows
    * whose forward window is truncated by the series end label 0 over
    * what remains — the same vertical-barrier semantics, shorter fuse.
    *
    * Determinism contract: barrier levels are one double multiply of the
    * row's own value; touch detection is pure comparison and FIRST-index
    * arithmetic (`array_position`, 0 when absent — DuckDB's
    * `list_position` agrees; its null-LIST case is coalesced in the
    * oracle), so the oracle reproduces every label bit-identically. The
    * forward window is collected as single-field STRUCTS, not bare
    * values: `collect_list` silently drops null elements, which would
    * shift every later position and break both the t_touch contract and
    * the oracle parity — a null forward value must occupy its slot as a
    * non-touch (both barrier comparisons are null → 0), identically to
    * the oracle's CASE.
    *
    * Scale shape: one (partition, order) sort; the forward window is a
    * bounded `collect_list` frame of `horizon` values per row — state is
    * O(horizon) per row, never whole-series — and the touch logic is a
    * single projection over that array. No joins, no second shuffle.
    * Cost is O(rows × horizon) memory-bandwidth, the irreducible shape
    * of a first-touch scan without specialized state; keep `horizon`
    * bounded (it is a label design parameter, typically 10–100).
    */
  def tripleBarrierLabels(
      df: DataFrame, valueCol: String, partition: Seq[String],
      order: Seq[String], horizon: Int, up: Double, down: Double): DataFrame = {
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    require(up > 0 && down > 0 && down < 1,
      s"barriers must be positive (down < 1), got up=$up down=$down")
    val fwd = Window.partitionBy(partition.map(col): _*)
      .orderBy(order.map(col): _*).rowsBetween(1, horizon)
    val v = col(valueCol)
    val touched = transform(col("__fwd"),
      x => when(x.getField("__v") >= v * lit(1.0 + up), 1)
        .when(x.getField("__v") <= v * lit(1.0 - down), -1)
        .otherwise(0))
    val p1 = array_position(col("__t"), 1)
    val pm = array_position(col("__t"), -1)
    df.withColumn("__fwd", collect_list(struct(v.as("__v"))).over(fwd))
      .withColumn("__t", touched)
      .withColumn("label",
        when(p1 > 0 && (pm === 0 || p1 < pm), 1)
          .when(pm > 0 && (p1 === 0 || pm < p1), -1)
          .otherwise(0))
      .withColumn("t_touch",
        when(col("label") === 1, p1).when(col("label") === -1, pm))
      .drop("__fwd", "__t")
  }
}
