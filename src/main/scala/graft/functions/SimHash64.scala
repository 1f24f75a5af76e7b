package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash: array<string> tokens -> 60-bit locality-sensitive
  * fingerprint. Bit b of the result is set iff the sum over DISTINCT tokens
  * of (+1 if bit b of hash(token) else -1) is positive.
  *
  * The token hash is the top 60 bits of md5 (the first 15 hex digits) —
  * the same deliberately-portable construction as the MinHash path: the
  * DuckDB oracle computes the bit-identical fingerprint with
  * `CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)`, which is what lets the
  * whole SimHash near-dup pipeline be verified against brute-force SQL
  * (q40) rather than rows-only. 60 bits also divide into 6 clean 10-bit
  * pigeonhole blocks for exact banding at Hamming <= 5.
  *
  * Semantics identical to the composable form [[graft.llmops.Dedup.simhash64]],
  * but one tight loop instead of 60 interpreted aggregate() passes over the
  * token array — HOFs evaluate outside codegen with no CSE, so the HOF tree
  * rescans the hash array per bit (measured 15s on sf0.1 documents; this is
  * sub-second).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string> input, got ${other.sql}")
  }

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

  /** Fingerprint width in bits. */
  val Bits = 60

  private val localMd5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(token) — the value of the first 15 hex digits,
    * shared with the DuckDB oracle SQL. */
  def tokenHash(tok: UTF8String): Long = {
    val md = localMd5.get()
    md.reset()
    val d = md.digest(tok.getBytes)
    var h = 0L
    var b = 0
    while (b < 8) {
      h = (h << 8) | (d(b) & 0xffL)
      b += 1
    }
    h >>> 4 // 64 bits read, drop the lowest nibble -> first 15 hex digits
  }

  /** Shared by the interpreted eval and the generated code (static call). */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[UTF8String](Math.max(8, n * 2))
    val votes = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        if (seen.add(tok)) {
          val h = tokenHash(tok)
          var b = 0
          while (b < Bits) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def simhash64(tokens: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      SimHash64(org.apache.spark.sql.graft.bridge.expression(tokens)))
}
