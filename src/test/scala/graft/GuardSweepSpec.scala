package graft

import org.apache.spark.sql.functions._

import graft.llmops.{Boilerplate, Similarity, TextAnalysis}

/** The r13 caller-frame guard sweep: every operator that joins a
  * CALLER-SUPPLIED frame on a key the contract requires unique must
  * fail loudly on a duplicate key, not silently multiply rows
  * (the Pairs/spreadZBacktest convention from r12). One case per
  * guarded operator, plus the Guards pruning-survival pin.
  */
class GuardSweepSpec extends SparkSpec {
  import spark.implicits._

  private def messageChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  private val docs = Seq(
    (1L, "the cat sat"), (2L, "the cat ran"), (3L, "a dog sat"))
    .toDF("doc_id", "text")

  test("bigramSurprisal: duplicate (v, w) rows in the bigrams table fail loudly") {
    val bigrams = Seq(("the", "cat", 2L), ("the", "cat", 1L), ("cat", "sat", 1L))
      .toDF("v", "w", "c")
    val vocab = Seq(("the", 2L), ("cat", 2L), ("sat", 2L)).toDF("tok", "c")
    val e = intercept[Exception] {
      TextAnalysis.bigramSurprisal(docs, "doc_id", "text", bigrams, vocab,
        lambda = 0.7, maxBroadcastVocab = 1000000L).collect()
    }
    assert(messageChain(e).contains("bigramSurprisal bigrams table"),
      s"expected the named uniqueness error, got: ${messageChain(e)}")
  }

  test("bigramSurprisal: duplicate tok rows in the vocab table fail loudly") {
    val bigrams = Seq(("the", "cat", 2L), ("cat", "sat", 1L)).toDF("v", "w", "c")
    val vocab = Seq(("the", 2L), ("the", 1L), ("cat", 2L)).toDF("tok", "c")
    val e = intercept[Exception] {
      TextAnalysis.bigramSurprisal(docs, "doc_id", "text", bigrams, vocab,
        lambda = 0.7, maxBroadcastVocab = 1000000L).collect()
    }
    assert(messageChain(e).contains("bigramSurprisal vocab table"),
      s"expected the named uniqueness error, got: ${messageChain(e)}")
  }

  test("unigramSurprisal: duplicate tok rows in the vocab table fail loudly") {
    val vocab = Seq(("the", 2L), ("the", 1L), ("cat", 2L)).toDF("tok", "c")
    val e = intercept[Exception] {
      TextAnalysis.unigramSurprisal(docs, "doc_id", "text", vocab,
        maxBroadcastVocab = 1000000L, oovPseudoCount = 0.5).collect()
    }
    assert(messageChain(e).contains("unigramSurprisal vocab table"),
      s"expected the named uniqueness error, got: ${messageChain(e)}")
  }

  test("boilerplateStats: duplicate gram_key rows in the precomputed set fail loudly") {
    val many = Seq.tabulate(6)(i => (i.toLong, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val boiler = Boilerplate.boilerplateGrams(many, "doc_id", "text", n = 2, minDf = 2L)
    val dup = boiler.unionByName(boiler.limit(1))
    val e = intercept[Exception] {
      Boilerplate.boilerplateStats(many, "doc_id", "text", n = 2,
        boilerGrams = dup, maxBroadcastGrams = 1000000L).collect()
    }
    assert(messageChain(e).contains("boilerplateStats boilerplate set"),
      s"expected the named uniqueness error, got: ${messageChain(e)}")
  }

  private val emb = Seq(
    (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)), (3L, Seq(1.0, 1.0)))
    .toDF("vec_id", "embedding")

  test("cosineTopKBatch: duplicate qids in the query frame fail loudly") {
    val qs = Seq((1L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0))).toDF("qid", "qv")
    val e = intercept[Exception] {
      Similarity.cosineTopKBatch(emb, "vec_id", "embedding",
        qs, "qid", "qv", k = 2).collect()
    }
    assert(messageChain(e).contains("cosineTopKBatch query frame"),
      s"expected the named uniqueness error, got: ${messageChain(e)}")
  }

  test("contrastivePairs: duplicate qids in the query frame fail loudly") {
    val lemb = Seq(
      (1L, Seq(1.0, 0.0), "a"), (2L, Seq(0.0, 1.0), "b"), (3L, Seq(1.0, 1.0), "a"))
      .toDF("vec_id", "embedding", "label")
    val qs = Seq((1L, Seq(1.0, 0.0), "a"), (1L, Seq(1.0, 0.0), "a"))
      .toDF("qid", "qv", "qlbl")
    val e = intercept[Exception] {
      Similarity.contrastivePairs(lemb, "vec_id", "embedding", "label",
        qs, "qid", "qv", "qlbl", k = 2).collect()
    }
    assert(messageChain(e).contains("contrastivePairs query frame"),
      s"expected the named uniqueness error, got: ${messageChain(e)}")
  }

  test("ivfTopKBatch: duplicate qids in the collected query frame fail loudly") {
    val corpus = Seq.tabulate(16)(i =>
      (i.toLong, Seq(math.cos(i * 0.3), math.sin(i * 0.3))))
      .toDF("vec_id", "embedding")
    val (cents, assigned) = Similarity.ivfIndex(
      corpus, "vec_id", "embedding", dim = 2, nCells = 2)
    val qs = Seq((7L, Seq(1.0, 0.0)), (7L, Seq(1.0, 0.0))).toDF("qid", "qv")
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopKBatch(cents, assigned, qs, "qid", "qv", nProbe = 1, k = 3)
    }
    assert(e.getMessage.contains("ivfTopKBatch query frame"),
      s"expected the named uniqueness error, got: ${e.getMessage}")
  }

  test("guard survives a projection that keeps only ONE column (r13 advice: pruning hazard)") {
    // pre-fix, the guard rode a single chosen column; a caller selecting
    // any OTHER column let Catalyst prune the guard away. Now every
    // column carries it: selecting just the key must still fail.
    val dup = Seq(("k1", 1.0), ("k1", 2.0), ("k2", 3.0)).toDF("k", "v")
    val guarded = graft.util.Guards.requireUniquePerKey(dup, Seq("k"), "pruning pin")
    val e = intercept[Exception] { guarded.select("k").collect() }
    assert(messageChain(e).contains("pruning pin"),
      s"expected the named uniqueness error, got: ${messageChain(e)}")
    val e2 = intercept[Exception] { guarded.select("v").collect() }
    assert(messageChain(e2).contains("pruning pin"),
      s"expected the named uniqueness error, got: ${messageChain(e2)}")
    // and a clean frame passes through unchanged on both projections
    val ok = Seq(("k1", 1.0), ("k2", 3.0)).toDF("k", "v")
    val g2 = graft.util.Guards.requireUniquePerKey(ok, Seq("k"), "pruning pin")
    assert(g2.select("k").collect().map(_.getString(0)).sorted === Array("k1", "k2"))
    assert(g2.select("v").collect().map(_.getDouble(0)).sorted === Array(1.0, 3.0))
  }
}
