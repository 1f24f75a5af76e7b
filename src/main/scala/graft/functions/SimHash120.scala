package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native wide SimHash: array<string> tokens -> 120-bit locality-sensitive
  * fingerprint as array<long> of two 60-bit words. Bit b of word w is set
  * iff the sum over DISTINCT tokens of (+1 if bit b of hash word w of the
  * token else -1) is positive.
  *
  * Why 120 and not 60 ([[SimHash64]]): exact pigeonhole banding at Hamming
  * radius 5 needs 6 blocks, and 60-bit fingerprints give only 10-bit
  * blocks — 1,024 distinct values per block, so bucket population grows
  * linearly with corpus size and within-bucket candidate pairs
  * quadratically. At 100 TB that collapses into an accidental all-pairs
  * join. 120 bits give 20-bit blocks (1,048,576 values) — the expected
  * bucket population stays ~n/2^20 per block, a 1024x cut in spurious
  * candidates at the same radius.
  *
  * Why exactly two 15-hex-digit words: the token hash words are md5 hex
  * digits 1-15 and 16-30, each parseable by the DuckDB oracle as
  * `CAST('0x' || substr(md5(t), pos, 15) AS BIGINT)` — the same
  * deliberately-portable construction as [[SimHash64]], so the whole
  * wide near-dup pipeline stays verifiable against brute-force SQL (q40)
  * rather than rows-only.
  */
case class SimHash120(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash120 requires array<string> input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash120.compute(input.asInstanceOf[ArrayData])

  /** Real codegen (not CodegenFallback): static call keeps the expression
    * inside the surrounding whole-stage span.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash120.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash120 =
    copy(child = newChild)
}

object SimHash120 {

  /** Fingerprint width in bits (two words of [[WordBits]]). */
  val Bits = 120

  /** Bits per fingerprint word (15 md5 hex digits). */
  val WordBits = 60

  private val localMd5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** The two 60-bit token-hash words: md5 hex digits 1-15 and 16-30.
    * Digit 16 is the low nibble of byte 7; digits 17-30 are the top 14
    * nibbles of bytes 8-15.
    */
  def tokenHashWords(tok: UTF8String): (Long, Long) = {
    val md = localMd5.get()
    md.reset()
    val d = md.digest(tok.getBytes)
    var w0 = 0L
    var w1 = 0L
    var b = 0
    while (b < 8) {
      w0 = (w0 << 8) | (d(b) & 0xffL)
      w1 = (w1 << 8) | (d(b + 8) & 0xffL)
      b += 1
    }
    (w0 >>> 4, ((w0 & 0xfL) << 56) | (w1 >>> 8))
  }

  /** Shared by the interpreted eval and the generated code (static call). */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[UTF8String](Math.max(8, n * 2))
    val votes = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        if (seen.add(tok)) {
          val (h1, h2) = tokenHashWords(tok)
          var b = 0
          while (b < WordBits) {
            if (((h1 >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            if (((h2 >>> b) & 1L) == 1L) votes(WordBits + b) += 1 else votes(WordBits + b) -= 1
            b += 1
          }
        }
      }
      i += 1
    }
    var f1 = 0L
    var f2 = 0L
    var b = 0
    while (b < WordBits) {
      if (votes(b) > 0) f1 |= (1L << b)
      if (votes(WordBits + b) > 0) f2 |= (1L << b)
      b += 1
    }
    new GenericArrayData(Array(f1, f2))
  }

  def simhash120(tokens: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      SimHash120(org.apache.spark.sql.graft.bridge.expression(tokens)))
}
