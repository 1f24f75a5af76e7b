package graft

import graft.llmops.Keywords

class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  test("tfidfTopTerms: hand-computed scores, rare terms outrank ubiquitous ones") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry banana banana")).toDF("doc_id", "text")
    val out = Keywords.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .groupBy(_._1)

    // doc 1: apple tf=2 df=1 -> 2*ln(3)=2.197224; banana tf=1 df=3 -> 0
    val d1 = out(1L).sortBy(-_._5)
    assert(d1.map(_._2).toSeq === Seq("apple", "banana"))
    assert(d1.head._5 === 2.197224)
    assert(d1(1)._5 === 0.0)

    // doc 2: cherry tf=1 df=2 -> ln(1.5)=0.405465 beats banana's 0
    val d2 = out(2L).sortBy(-_._5)
    assert(d2.map(_._2).toSeq === Seq("cherry", "banana"))
    assert(d2.head._5 === 0.405465)

    // doc 3: cherry 0.405465 vs banana tf=2 -> 0; cherry first
    val d3 = out(3L).sortBy(-_._5)
    assert(d3.map(_._2).toSeq === Seq("cherry", "banana"))
  }

  test("tfidfTopTerms: k larger than vocabulary returns all terms, no padding") {
    val docs = Seq((1L, "x y"), (2L, "y z")).toDF("doc_id", "text")
    val rows = Keywords.tfidfTopTerms(docs, "doc_id", "text", k = 10).collect()
    assert(rows.length === 4)
  }

  test("zipfProfile: ranks by count then token, invariant and coverage exact") {
    val docs = Seq(
      (1L, "a a a a b b b c c d"),   // a:4 b:3 c:2 d:1 -> 10 tokens
      (2L, "a b c")                   // a:5 b:4 c:3 d:1 -> 13 total
    ).toDF("doc_id", "text")
    val rows = Keywords.zipfProfile(docs, "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq((1L, "a", 5L), (2L, "b", 4L), (3L, "c", 3L)))
    assert(rows.map(_._4).toSeq === Seq(5L, 8L, 9L))          // rank * count
    assert(rows.map(_._5).toSeq ===
      Seq(5.0 / 13, 9.0 / 13, 12.0 / 13).map(x => math.floor(x * 1e6 + 0.5) / 1e6))
    // top-k smaller than vocabulary: d never appears
    assert(!rows.exists(_._2 == "d"))
  }
}
