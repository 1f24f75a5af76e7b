package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, IntegerType}

/** Native sign-random-projection bucket: vector -> int bucket key from the
  * sign pattern of `numPlanes` deterministic pseudo-random hyperplane
  * projections (coefficient(p, d) derived from MurmurHash3 of (p, d) — no
  * RNG state, identical on every executor).
  *
  * Native because the expression-tree form is numPlanes*dim literal terms
  * (1024 for 16x64) — janino recompiles that giant method for every job
  * that plans the expression, which cost more than the actual math by an
  * order of magnitude (measured: IVF pipeline 14.6s -> ~2s on sf0.1).
  */
case class SrpBucket(child: Expression, numPlanes: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  // coefficient table [plane][dim], lazily sized to the first vector's length
  @transient private var coefs: Array[Array[Double]] = _
  @transient private var coefDim: Int = -1

  private def coefficients(dim: Int): Array[Array[Double]] = {
    if (coefs == null || coefDim != dim) {
      coefs = Array.tabulate(numPlanes, dim) { (p, d) =>
        val h = scala.util.hashing.MurmurHash3.productHash((p, d))
        (h.toDouble / Int.MaxValue) % 1.0
      }
      coefDim = dim
    }
    coefs
  }

  private lazy val elementIsFloat =
    child.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cs = coefficients(n)
    var bucket = 0
    var p = 0
    while (p < numPlanes) {
      val row = cs(p)
      var proj = 0.0
      var d = 0
      while (d < n) {
        val x = if (elementIsFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        proj += x * row(d)
        d += 1
      }
      if (proj >= 0) bucket |= (1 << p)
      p += 1
    }
    java.lang.Integer.valueOf(bucket)
  }

  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}

object SrpBucket {
  def srpBucket(vec: Column, numPlanes: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      SrpBucket(org.apache.spark.sql.graft.bridge.expression(vec), numPlanes))
}
