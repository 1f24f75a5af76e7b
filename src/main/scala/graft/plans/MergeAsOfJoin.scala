package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, NamedExpression, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}

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
  extends BinaryExecNode with CodegenSupport {

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

  // ---- whole-stage codegen (same two-input-iterator shape as
  // SortMergeJoinExec: children are separate codegen stages feeding this
  // node's generated merge loop) ----

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  // output rows reference the mutable held row; parents must copy
  override def needCopyResult: Boolean = true

  protected override def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "masofLeftInput",
      v => s"$v = inputs[0];", forceInline = true)
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "masofRightInput",
      v => s"$v = inputs[1];", forceInline = true)
    // registered after the iterators, so its initializer may consume one
    val rHead = ctx.addMutableState("InternalRow", "masofRHead",
      v => s"$v = $rightInput.hasNext() ? (InternalRow) $rightInput.next() : null;",
      forceInline = true)
    val held = ctx.addMutableState("InternalRow", "masofHeld", forceInline = true)

    val leftRow = ctx.freshName("masofLeftRow")
    val lKeyNull = ctx.freshName("masofLKeyNull")
    val scanning = ctx.freshName("masofScanning")
    val cmp = ctx.freshName("masofCmp")
    val timeLE = ctx.freshName("masofTimeLE")
    val hasMatch = ctx.freshName("masofHasMatch")

    // evaluations against the current left row
    ctx.currentVars = null
    ctx.INPUT_ROW = leftRow
    val lKeyVars = leftKeys.map(BindReferences.bindReference(_, left.output).genCode(ctx))
    val lTimeVar = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
    val leftOutVars = left.output.map(BindReferences.bindReference(_, left.output).genCode(ctx))

    // evaluations against the right lookahead row (inside the scan loop)
    ctx.INPUT_ROW = rHead
    val rKeyVars = rightKeys.map(BindReferences.bindReference(_, right.output).genCode(ctx))
    val rTimeVar = BindReferences.bindReference(rightTime, right.output).genCode(ctx)

    // evaluations against the held row (match check)
    ctx.INPUT_ROW = held
    val heldKeyVars = rightKeys.map(BindReferences.bindReference(_, right.output).genCode(ctx))

    // lexicographic compare of (possibly null) right-head keys vs the
    // non-null left keys; null sorts first, matching the interpreted
    // RowOrdering and the declared child ordering
    val keyCompare = rKeyVars.zip(lKeyVars).zipWithIndex.map { case ((rk, lk), i) =>
      val dt = leftKeys(i).dataType
      val one =
        s"""if (${rk.isNull}) { $cmp = -1; }
           |else { $cmp = ${ctx.genComp(dt, rk.value.toString, lk.value.toString)}; }""".stripMargin
      if (i == 0) one else s"if ($cmp == 0) {\n$one\n}"
    }.mkString("\n")

    val heldKeyEquals = heldKeyVars.zip(lKeyVars).zipWithIndex.map { case ((hk, lk), i) =>
      val dt = leftKeys(i).dataType
      s"(!${hk.isNull} && ${ctx.genComp(dt, hk.value.toString, lk.value.toString)} == 0)"
    }.mkString(" && ")

    val advance = s"$rHead = $rightInput.hasNext() ? (InternalRow) $rightInput.next() : null;"

    // right-side output columns: read from the held row, all-null when no
    // match (mirrors the interpreted path's nullRight row)
    val rightOutVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("masofRIsNull")
      val value = ctx.freshName("masofRValue")
      val javaType = CodeGenerator.javaType(a.dataType)
      val code =
        code"""boolean $isNull = !$hasMatch || $held.isNullAt($i);
              |$javaType $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)}
              |  : (${CodeGenerator.getValue(held, a.dataType, i.toString)});""".stripMargin
      ExprCode(code, JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
    }

    val timeType = leftTime.dataType
    s"""while ($leftInput.hasNext()) {
       |  InternalRow $leftRow = (InternalRow) $leftInput.next();
       |  ${evaluateVariables(lKeyVars)}
       |  ${lTimeVar.code}
       |  boolean $lKeyNull = ${(lKeyVars.map(_.isNull.toString) :+ "false").mkString(" || ")};
       |  if (!$lKeyNull) {
       |    boolean $scanning = true;
       |    while ($scanning && $rHead != null) {
       |      ${evaluateVariables(rKeyVars)}
       |      int $cmp = 0;
       |      $keyCompare
       |      if ($cmp < 0) {
       |        $advance
       |      } else if ($cmp == 0) {
       |        ${rTimeVar.code}
       |        boolean $timeLE;
       |        if (${rTimeVar.isNull}) { $timeLE = true; }
       |        else if (${lTimeVar.isNull}) { $timeLE = false; }
       |        else { $timeLE = ${ctx.genComp(timeType, rTimeVar.value.toString, lTimeVar.value.toString)} <= 0; }
       |        if ($timeLE) {
       |          $held = $rHead.copy();
       |          $advance
       |        } else {
       |          $scanning = false;
       |        }
       |      } else {
       |        $scanning = false;
       |      }
       |    }
       |  }
       |  boolean $hasMatch = false;
       |  if (!$lKeyNull && $held != null) {
       |    ${evaluateVariables(heldKeyVars)}
       |    $hasMatch = $heldKeyEquals;
       |  }
       |  ${evaluateVariables(leftOutVars)}
       |  ${evaluateVariables(rightOutVars)}
       |  ${consume(ctx, leftOutVars ++ rightOutVars)}
       |  if (shouldStop()) return;
       |}""".stripMargin
  }
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
