package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  NamedExpression, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Sort-merge as-of join as a first-class physical operator (DESIGN.md
  * roadmap item 2; SURVEY §2.3 J2).
  *
  * Semantics: for each left row, attach the right row with equal key and
  * the greatest rightTime <= leftTime (backward as-of, inclusive —
  * DuckDB `ASOF LEFT JOIN` / pandas `merge_asof(direction="backward")`);
  * left rows without a match keep null right columns.
  *
  * Physical shape: both sides hash-clustered on the key and sorted by
  * (key, time) — declared via requiredChildDistribution /
  * requiredChildOrdering, so EnsureRequirements inserts exactly the
  * exchanges and sorts the plan needs (and elides them when the child is
  * already clustered/sorted, e.g. bucketed tables or an upstream keyed
  * window). The merge itself is a single forward pass over each partition
  * pair: O(|L| + |R|) per partition, O(1) state (one held right row), no
  * per-key candidate blowup.
  *
  * Versus the union + last(ignoreNulls) window form
  * ([[graft.analytics.TimeSeries.asOfJoin]], the composable baseline):
  * same one-shuffle-per-side cost model, but no union row inflation, no
  * window-function state machine, and sorted output usable downstream.
  * Versus Spark's own logical AsOfJoin (pandas API): that rewrites to an
  * aggregated join; this stays a streaming merge.
  *
  * Determinism: among right rows sharing the maximal (key, time) the merge
  * keeps the LAST in sort order; requiredChildOrdering appends the
  * remaining orderable right columns, so the winner is the max payload
  * tuple — the same pick as the window baseline's payload tie-break.
  * Null KEYS match nothing (SQL equi-join semantics, like DuckDB ASOF's
  * ON equality). Null times sort first and therefore match any left
  * time; callers who consider null times non-events should filter them
  * out.
  */
case class MergeAsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): MergeAsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for [[MergeAsOfJoinPlan]] — inject via
  * [[graft.GraftExtensions]] or at runtime through
  * `bridge.ensureStrategy` (the [[MergeAsOf.join]] API does the latter).
  */
object MergeAsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: MergeAsOfJoinPlan =>
      MergeAsOfJoinExec(
        j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class MergeAsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // right side additionally sorted by its remaining orderable columns so
  // the among-equal-times winner is deterministic (max payload tuple)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)) ++
      right.output.filterNot(a =>
          rightKeys.contains(a) || rightTime.semanticEquals(a))
        .filter(a => RowOrdering.isOrderable(a.dataType))
        .map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override def outputPartitioning: Partitioning = left.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      if (lIter.isEmpty) Iterator.empty
      else {
        val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
        val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
        val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
        val nullRight = new GenericInternalRow(rOut.length)
        val joined = new JoinedRow
        // parents assume UnsafeRow (e.g. SparkPlan.getByteArrayRdd); project
        // through `output` (right side nullable) so null checks are emitted
        val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

        new Iterator[InternalRow] {
          private var rHead: InternalRow = _
          private var rHeadKey: InternalRow = _
          private var held: InternalRow = _
          private var heldKey: InternalRow = _

          private def advanceRight(): Unit =
            if (rIter.hasNext) {
              rHead = rIter.next()
              rHeadKey = rKeyProj(rHead)
            } else {
              rHead = null
              rHeadKey = null
            }
          advanceRight()

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val lRow = lIter.next()
            val lKey = lKeyProj(lRow)
            // SQL equi-join semantics: a null key matches nothing (the
            // natural ordering would compare null == null). Null-key rows
            // sort first on both sides, so skipping them here leaves the
            // right cursor correctly positioned for non-null keys; right
            // null-key rows are dropped by the c < 0 advance below.
            if (lKey.anyNull) {
              return resultProj(joined(lRow, nullRight))
            }
            val lTime = lTimeProj(lRow).copy()
            var scanning = true
            while (scanning && rHead != null) {
              val c = keyOrd.compare(rHeadKey, lKey)
              if (c < 0) {
                advanceRight() // right key exhausted below left cursor
              } else if (c == 0 && timeOrd.compare(rTimeProj(rHead), lTime) <= 0) {
                held = rHead.copy() // newest right row at-or-before leftTime
                heldKey = rHeadKey.copy()
                advanceRight()
              } else {
                scanning = false
              }
            }
            if (held != null && keyOrd.compare(heldKey, lKey) == 0)
              resultProj(joined(lRow, held))
            else resultProj(joined(lRow, nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): MergeAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API for the merge as-of join. */
object MergeAsOf {

  /** As-of join `left` to `right` on equal `key` with the most recent
    * `right.rightTs <= left.leftTs` (inclusive backward match, left-outer).
    * Right columns come back prefixed `r_` (fresh attribute ids, so
    * self-joins are safe). Registers [[MergeAsOfJoinStrategy]] on the
    * session idempotently.
    */
  def join(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    val b = org.apache.spark.sql.graft.bridge
    b.ensureStrategy(spark, MergeAsOfJoinStrategy)
    val lPlan = b.analyzed(left)
    // re-alias the right side with fresh expr ids (self-join safety) and
    // r_-prefixed names (output name uniqueness)
    val rAnalyzed = b.analyzed(right)
    val rAliases = rAnalyzed.output.map(a =>
      Alias(a, s"r_${a.name}")(exprId = NamedExpression.newExprId))
    val rPlan = org.apache.spark.sql.catalyst.plans.logical.Project(rAliases, rAnalyzed)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    val node = MergeAsOfJoinPlan(
      lPlan, rPlan,
      Seq(attr(lPlan, key)), Seq(attr(rPlan, s"r_$key")),
      attr(lPlan, leftTs), attr(rPlan, s"r_$rightTs"))
    b.ofRows(spark, node)
  }
}
