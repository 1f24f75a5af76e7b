package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native document fingerprint: lexicographic minimum of md5-hex over the
  * text's character k-shingles (1-seed MinHash / winnowing-style content
  * fingerprint). Bit-identical to [[graft.llmops.TextAnalysis.fingerprint]]
  * (and its DuckDB oracle twin) including the short-text guard: texts
  * shorter than k hash their full remainder from position 0.
  *
  * Native because the HOF form (`array_min(transform(sequence..., md5))`)
  * evaluates interpreted, allocating the full shingle+hash arrays per row —
  * measured ~3.6s on sf0.1 documents vs sub-second here.
  */
case class ShingleFingerprint(child: Expression, shingleK: Int)
  extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    ShingleFingerprint.compute(input.asInstanceOf[UTF8String], shingleK)

  /** Real codegen: static call keeps the expression inside the
    * whole-stage span (shingleK embedded as a literal).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleFingerprint.compute($c, $shingleK)")

  override protected def withNewChildInternal(newChild: Expression): ShingleFingerprint =
    copy(child = newChild)
}

object ShingleFingerprint {
  private val localMd5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Shared by interpreted eval and generated code (static call).
    * Code-point shingling — matches Spark substr / DuckDB substr semantics.
    */
  def compute(input: UTF8String, shingleK: Int): UTF8String = {
    val cps = input.toString.codePoints().toArray
    val md = localMd5.get()
    val n = Math.max(cps.length - shingleK + 1, 1)
    var best: String = null
    var i = 0
    while (i < n) {
      md.reset()
      val count = Math.min(shingleK, cps.length - i)
      val h = hex(md.digest(new String(cps, i, count).getBytes("UTF-8")))
      if (best == null || h.compareTo(best) < 0) best = h
      i += 1
    }
    UTF8String.fromString(best)
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private[functions] def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def fingerprint(text: Column, shingleK: Int = 8): Column =
    org.apache.spark.sql.graft.bridge.column(
      ShingleFingerprint(org.apache.spark.sql.graft.bridge.expression(text), shingleK))
}
