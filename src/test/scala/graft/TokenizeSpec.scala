package graft

import org.apache.spark.sql.functions._

import graft.llmops.Tokenize

class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b a c a b"),   // a:3 b:2 c:1
    (2L, "b d"),           // d:1
    (3L, "a")).toDF("doc_id", "text")

  test("vocabulary: frequency rank, token tie-break, id 0 never assigned") {
    val v = Tokenize.vocabulary(corpus, "text", vocabSize = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a(4) > b(3) > c/d tie(1 each) -> c by token order
    assert(v.toSeq === Seq(("a", 4L, 1L), ("b", 3L, 2L), ("c", 1L, 3L)))
    assert(!v.map(_._3).contains(0L))
  }

  test("encodeWithVocab: in-vocab ids, OOV -> 0, null text -> null ids") {
    val vocab = Tokenize.vocabulary(corpus, "text", vocabSize = 2) // a=1, b=2
    val withNull = corpus.union(Seq((4L, null: String)).toDF("doc_id", "text"))
    val enc = Tokenize.encodeWithVocab(withNull, "text", vocab)
      .select(col("doc_id"), col("ids")).collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    assert(enc(1L).get === Seq(1L, 2L, 1L, 0L, 1L, 2L)) // c is OOV
    assert(enc(2L).get === Seq(2L, 0L))                 // d is OOV
    assert(enc(3L).get === Seq(1L))
    assert(enc(4L).isEmpty, "null text must encode to null, not empty")
  }

  test("custom oovId is honored and may not collide with an assigned id") {
    val vocab = Tokenize.vocabulary(corpus, "text", vocabSize = 1) // a=1
    val enc = Tokenize.encodeWithVocab(corpus, "text", vocab, oovId = -1L)
      .filter(col("doc_id") === 2L).select(col("ids"))
      .collect()(0).getSeq[Long](0)
    assert(enc === Seq(-1L, -1L)) // b and d both OOV
    val ex = intercept[IllegalArgumentException] {
      Tokenize.encodeWithVocab(corpus, "text", vocab, oovId = 1L)
    }
    assert(ex.getMessage.contains("collides"))
  }

  test("vocabulary byte budget fails loudly with the remedy") {
    val vocab = Tokenize.vocabulary(corpus, "text", vocabSize = 4)
    val ex = intercept[IllegalArgumentException] {
      Tokenize.encodeWithVocab(corpus, "text", vocab, maxVocabBytes = 4L)
    }
    assert(ex.getMessage.contains("prune the vocabulary"))
  }

  test("coverageCurve: monotone, bounded by 1, exact at full-vocab cutoff") {
    val out = Tokenize.coverageCurve(corpus, "text", maxK = 10)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    // universe is {a, b, c, d} -> 4 rows even at maxK=10
    assert(out.map(_._2).toSeq === Seq("a", "b", "c", "d"))
    assert(out.map(_._3).toSeq === out.map(_._3).sorted.toSeq, "coverage must be monotone")
    assert(out.forall(_._3 <= 1.0))
    // a=4 of 9, +b=7 of 9, +c=8 of 9, +d=9 of 9
    assert(out.last._3 === 1.0)
    assert(math.abs(out.head._3 - 4.0 / 9) < 1e-6)
  }

  test("content-identical encode expressions are semantically equal (Seq fields)") {
    // the reason VocabEncodeExpr stores Seq, not Array: array fields
    // compare by reference, which would defeat semanticEquals — and
    // with it CSE and exchange reuse between identical encodes
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val child = Literal.create(Seq("x", "q"), ArrayType(StringType))
    val a = graft.functions.VocabEncodeExpr(child, Seq("x", "y"), Seq(1L, 2L), 0L)
    val b = graft.functions.VocabEncodeExpr(child.copy(), Seq("x", "y").map(identity),
      Seq(1L, 2L).map(identity), 0L)
    assert(a.semanticEquals(b), "content-identical vocab literals must compare equal")
    val c = graft.functions.VocabEncodeExpr(child, Seq("x", "z"), Seq(1L, 2L), 0L)
    assert(!a.semanticEquals(c), "different vocabularies must not compare equal")
  }

  test("caller-supplied (token, token_id) table works — trained-vocab path") {
    val custom = Seq(("b", 7L), ("d", 9L)).toDF("token", "token_id")
    val enc = Tokenize.encodeWithVocab(corpus, "text", custom)
      .filter(col("doc_id") === 2L).select(col("ids"))
      .collect()(0).getSeq[Long](0)
    assert(enc === Seq(7L, 9L))
  }
}
