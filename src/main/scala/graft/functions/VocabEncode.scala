package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native vocabulary lookup over a token array — the text→input_ids
  * encoding step of a training-data pipeline (a word-level tokenizer
  * apply; the id space is whatever the supplied vocabulary says, e.g.
  * frequency rank from [[graft.llmops.Tokenize.vocabulary]]).
  *
  * The vocabulary travels inside the expression as two parallel arrays
  * (token, id) — the same plan-literal transport as
  * [[BloomMightContain]]'s filter image and the PQ ADC tables — and is
  * hashed ONCE per executor into a transient lazy HashMap, so the
  * per-token cost is an O(1) probe, not the O(|vocab|) linear scan a
  * `map(...)` literal + `element_at` plan would pay (Catalyst's
  * GetMapValue scans keys). Out-of-vocabulary tokens (and null array
  * slots) encode to `oovId`. Generated code calls through a reference
  * object, so the lookup stays inside the surrounding whole-stage span.
  *
  * Scale contract: a real tokenizer vocabulary is 32k–100k entries —
  * megabytes, fine as a task-broadcast literal; the byte budget is
  * enforced by the caller ([[graft.llmops.Tokenize.encodeWithVocab]]),
  * mirroring the ADC `maxAdcBytes` discipline.
  *
  * The vocabulary fields are Seq, not Array, DELIBERATELY: case-class
  * equality over arrays is reference identity, which would make two
  * content-identical encode expressions never `semanticEquals` — plan
  * canonicalization, subexpression elimination, and exchange reuse
  * would all silently miss. Seq equality is by content.
  */
case class VocabEncodeExpr(
    child: Expression,
    tokens: Seq[String],
    ids: Seq[Long],
    oovId: Long)
  extends UnaryExpression {

  require(tokens.length == ids.length,
    s"vocabulary arrays disagree: ${tokens.length} tokens vs ${ids.length} ids")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"VocabEncodeExpr expects ARRAY<STRING>, got ${other.catalogString}")
    }

  @transient private lazy val lut: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](tokens.length * 2)
    val ti = tokens.iterator; val ii = ids.iterator
    while (ti.hasNext) m.put(UTF8String.fromString(ti.next()), java.lang.Long.valueOf(ii.next()))
    m
  }

  /** Shared by interpreted eval and generated code. */
  def encode(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) oovId
        else {
          val v = lut.get(arr.getUTF8String(i))
          if (v == null) oovId else v.longValue()
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabEncode", this, classOf[VocabEncodeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): VocabEncodeExpr =
    copy(child = newChild)
}

object VocabEncode {

  /** Column form: encode a token array to ids via the (token, id)
    * vocabulary; unknown tokens become `oovId`.
    */
  def encode(
      tokenArray: Column, tokens: Seq[String], ids: Seq[Long],
      oovId: Long = 0L): Column =
    org.apache.spark.sql.graft.bridge.column(
      VocabEncodeExpr(
        org.apache.spark.sql.graft.bridge.expression(tokenArray),
        tokens, ids, oovId))
}
