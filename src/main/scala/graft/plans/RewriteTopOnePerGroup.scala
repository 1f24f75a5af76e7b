package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Optimizer rule: rewrite "rank-1-per-group" — a row_number window
  * followed by `rn = 1` — into a min_by/max_by hash aggregate.
  *
  * The window form sorts every partition's rows per key (Exchange + Sort +
  * Window); the aggregate form is a standard partial+final hash aggregate
  * over the same Exchange — no sort, and map-side partials shrink the
  * shuffle to one candidate row per (mapper, key). At 100 TB "latest row
  * per key" over a billion keys, that is the difference between a sort of
  * the whole table and a combiner-style reduction (SURVEY §7 optional
  * perf-only Catalyst work).
  *
  * Scope (rewrites only when provably equivalent):
  *   - single window expression, exactly row_number() with its default
  *     ROWS UNBOUNDED PRECEDING..CURRENT ROW frame;
  *   - filter is exactly `rn = 1` / `1 = rn`;
  *   - all sort orders Ascending NullsFirst (struct ordering semantics,
  *     -> MinBy) or all Descending NullsLast (-> MaxBy);
  *   - ties: row_number on a non-total order picks an arbitrary in-order
  *     row; min_by/max_by picks an arbitrary extremal row — both are
  *     deterministic only under a total order, same contract.
  *
  * Opt-in: spark.graft.rewriteTopOne=true (registered by
  * [[graft.GraftExtensions]]).
  */
object RewriteTopOnePerGroup extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.rewriteTopOne", "false").toBoolean

  private def isRowNumberFrame(frame: WindowFrame): Boolean = frame match {
    case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
    case _ => false
  }

  /** Matches Filter(rn=1, Window([row_number as rn], p, o, child)) — by the
    * time user rules run, column pruning has hoisted projections above the
    * filter and InferWindowGroupLimit has inserted a per-partition
    * WindowGroupLimit below the window (a rank combiner we happily keep as
    * the aggregate's child: it pre-drops all but one candidate per key per
    * partition).
    */
  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case f @ Filter(cond,
          w @ Window(Seq(Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(part, order, frame)), _)), _, _, child, _))
          if isRowNumberFrame(frame) && part.nonEmpty && order.nonEmpty =>
        val rnAttr = w.windowOutputSet.head
        val condIsRnEq1 = cond match {
          case EqualTo(a: AttributeReference, Literal(1, _)) => a.exprId == rnAttr.exprId
          case EqualTo(Literal(1, _), a: AttributeReference) => a.exprId == rnAttr.exprId
          case _ => false
        }
        val allAsc = order.forall(so => so.direction == Ascending && so.nullOrdering == NullsFirst)
        val allDesc = order.forall(so => so.direction == Descending && so.nullOrdering == NullsLast)
        if (condIsRnEq1 && (allAsc || allDesc)) {
          val rowStruct = CreateStruct(child.output.toSeq)
          val ordStruct = CreateStruct(order.map(_.child))
          val aggFn = if (allAsc) MinBy(rowStruct, ordStruct) else MaxBy(rowStruct, ordStruct)
          val minRow = Alias(
            AggregateExpression(aggFn, Complete, isDistinct = false), "__top1_row")()
          val agg = Aggregate(part, Seq(minRow), child)
          val minRowRef = minRow.toAttribute
          // Reproduce the Filter's output (child cols + rn) under the
          // ORIGINAL exprIds so parents resolve unchanged; rn is the
          // constant 1 by construction.
          val restored = child.output.zipWithIndex.map { case (a, idx) =>
            Alias(GetStructField(minRowRef, idx, Some(a.name)), a.name)(exprId = a.exprId)
          } :+ Alias(Literal(1), rnAttr.name)(exprId = rnAttr.exprId)
          Project(restored, agg)
        } else f
    }
  }
}
