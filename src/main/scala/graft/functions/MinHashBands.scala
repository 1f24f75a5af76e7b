package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.llmops.Dedup

/** Native MinHash+LSH banding: text -> array of `numBands` band-bucket md5
  * hex strings, in one tight per-row loop.
  *
  * Semantics are bit-identical to the composable higher-order-function form
  * in [[graft.llmops.Dedup]] (and to the DuckDB oracle SQL):
  * code-point k-shingles -> md5 hex -> first 15 hex digits as int mod p ->
  * per-permutation minima of (a*h+b) mod p -> md5 of the comma-joined
  * decimal signature slice per band.
  *
  * Why native: higher-order functions evaluate interpreted (outside
  * whole-stage codegen) and allocate per element per lambda step — measured
  * 33s on sf0.1 documents vs well under 1s for this loop. This is the
  * preference order from SURVEY §7: compose built-ins first, drop to a
  * custom Catalyst Expression only where perf demands. Implements real
  * doGenCode (static-call form) so the expression stays inside the
  * surrounding whole-stage span.
  */
case class MinHashBands(
    child: Expression,
    shingleK: Int,
    numHashes: Int,
    numBands: Int)
  extends UnaryExpression {

  require(numBands > 0 && numHashes % numBands == 0,
    s"numHashes ($numHashes) must be a positive multiple of numBands ($numBands)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[UTF8String], shingleK, numHashes, numBands)

  /** Real codegen: static call, parameters embedded as literals. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashBands.compute($c, $shingleK, $numHashes, $numBands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {
  private val localMd5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  // coefficient tables are tiny and deterministic per numHashes; cache them
  private val coeffCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[(Long, Long)]]()
  private def coeffs(numHashes: Int): Array[(Long, Long)] =
    coeffCache.computeIfAbsent(numHashes, n => Dedup.minhashCoeffs(n).toArray)

  /** Shared by interpreted eval and generated code (static call).
    * Code-point shingling (NOT UTF-16 units) — matches Spark substr /
    * DuckDB substr semantics on supplementary-plane characters.
    */
  def compute(input: UTF8String, shingleK: Int, numHashes: Int, numBands: Int): GenericArrayData = {
    val p = Dedup.MinhashP
    val cs = coeffs(numHashes)
    val rowsPerBand = numHashes / numBands
    val cps = input.toString.codePoints().toArray
    val md = localMd5.get()
    val minima = Array.fill(numHashes)(p)
    val n = cps.length - shingleK + 1
    var i = 0
    while (i < n) {
      md.reset()
      val digest = md.digest(new String(cps, i, shingleK).getBytes("UTF-8"))
      // first 15 hex chars = top 60 bits of the digest
      var h = 0L
      var b = 0
      while (b < 8) {
        h = (h << 8) | (digest(b) & 0xffL)
        b += 1
      }
      h = (h >>> 4) % p // 64 bits read, drop the lowest nibble -> 60 bits
      var j = 0
      while (j < numHashes) {
        val v = (h * cs(j)._1 + cs(j)._2) % p
        if (v < minima(j)) minima(j) = v
        j += 1
      }
      i += 1
    }
    val bands = new Array[AnyRef](numBands)
    var bi = 0
    while (bi < numBands) {
      val sb = new StringBuilder
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append(',')
        sb.append(minima(bi * rowsPerBand + r))
        r += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      bands(bi) = UTF8String.fromString(hex(d))
      bi += 1
    }
    new GenericArrayData(bands)
  }

  /** Column API for the expression (Spark 4: Column<->Expression bridging
    * goes through the sql-package shim, see org.apache.spark.sql.graft.bridge).
    */
  def minhashBands(text: Column, shingleK: Int, numHashes: Int, numBands: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      MinHashBands(
        org.apache.spark.sql.graft.bridge.expression(text),
        shingleK, numHashes, numBands))
}
