package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter membership probe over a 64-bit key column — the
  * approximate-membership gate in front of exact set operations
  * ([[graft.llmops.Dedup.bloomGatedNewDocs]]). `mightContain = false` is
  * definitive (no false negatives for inserted keys), so a gate built
  * over a corpus's keys can discharge provably-absent rows WITHOUT
  * shuffling them into a join; only might-contain rows proceed to the
  * exact operator.
  *
  * The filter travels as its serialized byte image inside the expression
  * (the same transport Spark's own InjectRuntimeFilter uses for its
  * bloom subquery result) and is deserialized once per executor via a
  * transient lazy; generated code probes through a reference object, so
  * the test stays inside the surrounding whole-stage span — same pattern
  * as [[SrpBucket]].
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"BloomMightContain expects a LONG key column, got ${child.dataType.catalogString}")
    }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  /** Shared by interpreted eval and generated code. */
  def mightContain(key: Long): Boolean = filter.mightContainLong(key)

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(mightContain(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomGate", this, classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomGate {

  /** Serialize a sketch BloomFilter to its portable byte image. */
  def serialize(filter: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    filter.writeTo(out)
    out.toByteArray
  }

  /** Column form: does `filter` possibly contain the long `key`? */
  def mightContain(key: Column, filter: BloomFilter): Column =
    org.apache.spark.sql.graft.bridge.column(
      BloomMightContain(
        org.apache.spark.sql.graft.bridge.expression(key), serialize(filter)))
}
