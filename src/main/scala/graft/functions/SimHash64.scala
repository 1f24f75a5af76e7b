package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash: array<string> tokens -> 64-bit locality-sensitive
  * fingerprint. Bit b of the result is set iff the sum over DISTINCT tokens
  * of (+1 if bit b of xxhash64(token) else -1) is positive.
  *
  * Semantics identical to the composable form [[graft.llmops.Dedup.simhash64]]
  * (same xxhash64 seed 42 via Spark's own XxHash64Function), but one tight
  * loop instead of 64 interpreted aggregate() passes over the token array —
  * HOFs evaluate outside codegen with no CSE, so the HOF tree rescans the
  * hash array per bit (measured 15s on sf0.1 documents; this is sub-second).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.compute(input.asInstanceOf[ArrayData]))

  /** Real codegen (not CodegenFallback): emit a static call so the
    * expression stays inside the surrounding whole-stage span — no
    * interpreted-eval bridge, no per-row boxing of the input row.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Shared by the interpreted eval and the generated code (static call). */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[UTF8String](Math.max(8, n * 2))
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        if (seen.add(tok)) {
          val h = XxHash64Function.hash(tok, StringType, 42L)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def simhash64(tokens: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      SimHash64(org.apache.spark.sql.graft.bridge.expression(tokens)))
}
