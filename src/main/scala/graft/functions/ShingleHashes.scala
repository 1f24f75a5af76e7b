package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle-set operators for the exact-Jaccard verify stage of
  * near-dup detection (SURVEY §2.10 X2).
  *
  * [[ShingleHashesSorted]] maps a document to the SORTED DISTINCT array of
  * 64-bit hashes of its code-point k-shingles, in one tight loop per row.
  * [[SortedIntersectCount]] merge-counts the intersection of two such
  * arrays in O(|A|+|B|) with zero allocation.
  *
  * Together they turn candidate-pair verification into two narrow joins
  * (pair ids against per-doc hash arrays) plus a codegen'd per-pair merge —
  * replacing the explode-shingles + double equi-join form whose shuffle
  * carries |pairs| x |shingles-per-doc| rows. At 100 TB the arrays stay
  * with the docs table (a few KB per doc); only candidate pairs move.
  *
  * The hash is an FNV/murmur-style 64-bit mix over code points — an
  * equality proxy only, never compared across engines: the DuckDB oracle
  * computes the same Jaccard from the shingle STRINGS, and the two agree
  * exactly unless two distinct shingles of one document collide in 64 bits
  * (~1e-15 per typical doc).
  */
case class ShingleHashesSorted(child: Expression, shingleK: Int)
  extends UnaryExpression {

  require(shingleK > 0, s"shingleK must be positive, got $shingleK")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes_sorted requires a string input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashesSorted.compute(input.asInstanceOf[UTF8String], shingleK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashesSorted.compute($c, $shingleK)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesSorted =
    copy(child = newChild)
}

object ShingleHashesSorted {

  /** murmur3 fmix64 finalizer — full-avalanche 64-bit mix. */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Shared by interpreted eval and generated code (static call).
    * Code-point shingling, same window semantics as [[MinHashBands]] /
    * [[graft.llmops.Dedup.shingles]]: windows of `k` code points, text
    * shorter than `k` yields an empty array.
    */
  def compute(input: UTF8String, shingleK: Int): GenericArrayData = {
    val cps = input.toString.codePoints().toArray
    val n = cps.length - shingleK + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < shingleK) {
        h = (h ^ cps(i + j)) * 0x100000001b3L
        j += 1
      }
      hashes(i) = fmix64(h)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    // in-place dedup of the sorted run
    var w = 1
    i = 1
    while (i < n) {
      if (hashes(i) != hashes(w - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == n) hashes else java.util.Arrays.copyOf(hashes, w))
  }

  def shingleHashesSorted(text: Column, shingleK: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      ShingleHashesSorted(org.apache.spark.sql.graft.bridge.expression(text), shingleK))
}

/** Merge-count of the intersection of two SORTED DISTINCT long arrays.
  * O(|A|+|B|), zero allocation; callers guarantee sortedness (the output
  * contract of [[ShingleHashesSorted]]).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<bigint> arguments, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Shared by interpreted eval and generated code (static call). */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      SortedIntersectCount(
        org.apache.spark.sql.graft.bridge.expression(a),
        org.apache.spark.sql.graft.bridge.expression(b)))
}
