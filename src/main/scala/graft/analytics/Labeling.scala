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

  /** AVERAGE UNIQUENESS sample weights for triple-barrier labels (López
    * de Prado ch. 4, public methodology): overlapping label windows make
    * observations non-IID — an event whose horizon is shared with five
    * concurrent events carries ~1/5 the information of an isolated one.
    * Each event's label SPAN runs from the next row to its barrier touch
    * (or the vertical horizon, truncated at the series end); with
    * c_t = how many spans cover row t, the weight is
    *
    *   u_i = (1/L_i) Σ_{t ∈ span_i} 1/c_t     (null when L_i = 0).
    *
    * Output adds `label`, `label_span` (L_i) and `uniqueness`
    * (sr6-pinned).
    *
    * Scale shape: everything rides ONE (partition, order) sort — the
    * label frame, row numbers, and two further bounded frames: a
    * backward collect of the previous `horizon` (rn, L) pairs (a span
    * from further back cannot reach the current row, so coverage is a
    * size-of-filter over that array — no self-join, no boundary-delta
    * shuffle), and a forward collect of the next `horizon` coverage
    * reciprocals sliced to the span. State is O(horizon) per row
    * throughout.
    */
  def averageUniqueness(
      df: DataFrame, valueCol: String, partition: Seq[String],
      order: Seq[String], horizon: Int, up: Double, down: Double): DataFrame = {
    import graft.util.Partitioning.{stableRound6 => sr6}
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order.map(col): _*)
    val whole = Window.partitionBy(partition.map(col): _*)
    val back = w.rowsBetween(-horizon, -1)
    val fwd = w.rowsBetween(1, horizon)
    val labeled = tripleBarrierLabels(df, valueCol, partition, order, horizon, up, down)
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__nn", count(lit(1)).over(whole))
      .withColumn("label_span",
        coalesce(col("t_touch"),
          least(lit(horizon.toLong), col("__nn") - col("__rn"))))
    val rn = col("__rn")
    val covered = labeled
      .withColumn("__prev",
        collect_list(struct(rn.as("__rn"), col("label_span").as("__l"))).over(back))
      // spans never exceed `horizon`, so every span covering this row
      // starts within the backward frame — coverage without a self-join
      .withColumn("__c",
        size(filter(col("__prev"),
          p => p.getField("__l") >= rn - p.getField("__rn"))).cast("long"))
      // rows inside any consulted span have __c >= 1 by construction;
      // the 0 case exists only at never-consulted rows — keep the
      // division ANSI-safe there
      .withColumn("__cinv",
        when(col("__c") === 0L, lit(0.0)).otherwise(lit(1.0) / col("__c")))
    covered
      .withColumn("__finv", collect_list(col("__cinv")).over(fwd))
      .withColumn("uniqueness",
        when(col("label_span") === 0L, lit(null).cast("double"))
          .otherwise(sr6(
            aggregate(slice(col("__finv"), lit(1), col("label_span").cast("int")),
              lit(0.0), _ + _) / col("label_span"))))
      .drop("__rn", "__nn", "__prev", "__c", "__cinv", "__finv")
  }
}
