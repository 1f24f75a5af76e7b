package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-level n-gram builders for corpus analysis (SURVEY §2.10 X4
  * and the decontamination path).
  *
  * Semantics are the portable contract shared with the DuckDB oracle:
  * lowercase the text, split on `\s+` runs (empty tokens dropped), then
  * emit every window of `n` consecutive tokens re-joined with a single
  * space. Texts shorter than `n` tokens yield an empty array.
  *
  * Native because the HOF form (`transform(sequence(...), i =>
  * array_join(slice(tokens, i+1, n), ' '))`) evaluates interpreted with
  * no CSE: the token array is re-materialized per reference, each window
  * allocates a slice plus a join, and the lambda dispatch alone dominates
  * — measured 3.3-4.9 s per sf0.1 document query vs sub-second here.
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
  extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires a string input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordNgrams.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {

  private val ws = Pattern.compile("\\s+")

  /** Lowercased whitespace tokens, empty strings dropped — identical to
    * `filter(split(lower(text), "\\s+"), length > 0)` (Spark's `split`
    * uses the same Java regex engine and `lower` the same UTF8String
    * lowercasing).
    */
  private[functions] def tokenize(input: UTF8String): Array[String] = {
    val toks = ws.split(input.toLowerCase.toString)
    // a leading separator yields one empty first token; runs can't yield others
    if (toks.length > 0 && toks(0).isEmpty) java.util.Arrays.copyOfRange(toks, 1, toks.length)
    else toks
  }

  /** Shared by interpreted eval and generated code (static call). */
  def compute(input: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    val toks = tokenize(input)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    if (!distinct) {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        out(i) = UTF8String.fromString(joinWindow(toks, i, n))
        i += 1
      }
      new GenericArrayData(out)
    } else {
      // first-occurrence order, matching array_distinct over the full array
      val seen = new java.util.LinkedHashSet[String](count * 2)
      var i = 0
      while (i < count) {
        seen.add(joinWindow(toks, i, n))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var w = 0
      while (it.hasNext) { out(w) = UTF8String.fromString(it.next()); w += 1 }
      new GenericArrayData(out)
    }
  }

  private[functions] def joinWindow(toks: Array[String], start: Int, n: Int): String = {
    if (n == 1) return toks(start)
    var len = n - 1
    var j = 0
    while (j < n) { len += toks(start + j).length; j += 1 }
    val sb = new java.lang.StringBuilder(len)
    j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(toks(start + j))
      j += 1
    }
    sb.toString
  }

  def wordNgrams(text: Column, n: Int, distinct: Boolean = false): Column =
    org.apache.spark.sql.graft.bridge.column(
      WordNgrams(org.apache.spark.sql.graft.bridge.expression(text), n, distinct))
}

/** Streaming n-gram expansion: a custom Catalyst GENERATOR that yields
  * one output row per gram without ever materializing the per-document
  * gram array (`explode(word_ngrams(...))` allocates |grams| strings in
  * one GenericArrayData before the explode copies them out — for a
  * 1 MB document that is a multi-MB transient allocation per row; this
  * yields them one at a time). Same gram contract as [[WordNgrams]]
  * (lowercase, `\s+` split, space-joined windows), verified equivalent
  * in LlmopsSpec.
  *
  * Generators evaluate in GenerateExec outside whole-stage codegen
  * (CodegenFallback — true for most built-in generators too); the win
  * here is allocation shape, not instruction count.
  */
case class WordNgramsStream(child: Expression, n: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.Generator
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams_stream requires a string argument, got ${other.sql}")
  }

  override def elementSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("gram", StringType, nullable = false)))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else {
      val toks = WordNgrams.tokenize(t.asInstanceOf[UTF8String])
      val count = toks.length - n + 1
      if (count <= 0) Iterator.empty
      else (0 until count).iterator.map { i =>
        org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(WordNgrams.joinWindow(toks, i, n)))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgramsStream =
    copy(child = newChild)
}

object WordNgramsStream {
  def wordNgramsStream(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      WordNgramsStream(org.apache.spark.sql.graft.bridge.expression(text), n))
}

/** Native Gopher-style repetition statistics (Rae et al. 2021 §A1.1):
  * struct(n_grams, top_count, dup_count) over the document's word
  * `n`-gram multiset, where `top_count` is the multiplicity of the most
  * frequent gram and `dup_count` the number of gram occurrences whose
  * gram appears more than once. Gram semantics are [[WordNgrams]]'s
  * portable contract, so the DuckDB oracle reproduces the counts from
  * the gram strings.
  *
  * One open-addressing-free hash count per row (java HashMap on the
  * joined gram), no sorted-array materialization, no per-element lambda
  * dispatch — replaces the interpreted `aggregate(array_sort(...))` fold
  * that was the slowest query in BENCH_r04 (4.9 s → sub-second at sf0.1).
  */
case class GramRepetitionStats(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("dup_count", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_repetition_stats requires a string input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    GramRepetitionStats.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramRepetitionStats.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): GramRepetitionStats =
    copy(child = newChild)
}

object GramRepetitionStats {

  /** Shared by interpreted eval and generated code (static call). */
  def compute(input: UTF8String, n: Int): InternalRow = {
    val toks = WordNgrams.tokenize(input)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[String, Int](count * 2)
    var i = 0
    while (i < count) {
      // gram identity only — the joined window string is the map key
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      counts.merge(sb.toString, 1, (a, b) => a + b)
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      if (c > top) top = c
      if (c > 1L) dup += c
    }
    new GenericInternalRow(Array[Any](count.toLong, top, dup))
  }

  def gramRepetitionStats(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      GramRepetitionStats(org.apache.spark.sql.graft.bridge.expression(text), n))
}
