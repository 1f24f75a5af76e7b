package graft

import org.apache.spark.sql.functions._

import graft.llmops.{Bpe, Chunking, Dedup, Retrieval}

/** Specs for the round-10 corpus operators: BM25 retrieval, sliding
  * chunking, SemDeDup keep-list assignment, and BPE pair statistics.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- bigram surprisal ----

  test("bigramSurprisal: hand-computed Jelinek-Mercer score; short docs absent") {
    val docs = Seq(
      (1L, "a b a b"),   // pairs (a,b)x2, (b,a)
      (2L, "b a"),       // pair (b,a)
      (3L, "x")          // one token: no bigrams -> absent
    ).toDF("doc_id", "text")
    val out = graft.llmops.TextAnalysis.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size === 2)
    // corpus: c(a,b)=2, c(b,a)=2, c(a,.)=2, c(b,.)=2, unigrams a=3 b=3 T=7
    // (doc 3's 'x' counts in T); every pair scores
    // .75*(2/2) + .25*c(w)/T and both docs average the same two pair types
    val pAB = 0.75 + 0.25 * 3.0 / 7.0
    val expected = math.floor(-math.log(pAB) * 1e6 + 0.5) / 1e6
    assert(out(1L).getAs[Long]("n_bigrams") === 3)
    assert(out(2L).getAs[Long]("n_bigrams") === 1)
    assert(out(1L).getAs[Double]("surprisal") === expected)
    assert(out(2L).getAs[Double]("surprisal") === expected)
  }

  test("bigramSurprisal: scrambled word order scores higher than fluent repeats") {
    val fluent = (0 until 10).map(i => (i.toLong, "the cat sat on the mat"))
    val salad = Seq((99L, "mat the on sat cat the")) // same words, broken sequences
    val out = graft.llmops.TextAnalysis.bigramSurprisal(
      (fluent ++ salad).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("surprisal")).toMap
    val fluentScore = out(0L)
    assert(out(99L) > fluentScore,
      s"salad ${out(99L)} should outscore fluent $fluentScore")
    // every word is corpus-common — the unigram model cannot separate them
    val uni = graft.llmops.TextAnalysis.unigramSurprisal(
      (fluent ++ salad).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("surprisal")).toMap
    assert(math.abs(uni(99L) - uni(0L)) < 1e-9,
      s"unigram should be blind to order: ${uni(99L)} vs ${uni(0L)}")
  }

  test("bigramSurprisal: hash-join regime (maxBroadcastVocab=1) is output-identical to broadcast") {
    // the r10 verdict's untested path: every run to date stayed under
    // the 10M-token broadcast guard, so the hash-join fallback had
    // never executed. Force it and pin output identity — only the join
    // STRATEGY may move, never a value.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val broad = graft.llmops.TextAnalysis.bigramSurprisal(docs, "doc_id", "text")
    val a = broad.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // at sf0.001 the count tables are small enough that AQE re-broadcasts
    // them at runtime even without the operator's hint — which is correct
    // at scale but would leave the shuffle-join CODE PATH untested here;
    // pin the thresholds off so the fallback genuinely executes
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      saved.foreach { case (k, _) => spark.conf.set(k, "-1") }
      val hashed = graft.llmops.TextAnalysis.bigramSurprisal(
        docs, "doc_id", "text",
        graft.llmops.TextAnalysis.bigramCounts(docs, "text"),
        graft.llmops.TextAnalysis.unigramVocab(docs, "text"),
        lambda = 0.75, maxBroadcastVocab = 1L)
      val b = hashed.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
      val plan = hashed.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(!plan.contains("BroadcastHashJoin"),
        s"guard at 1 must disable the broadcast:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"fallback regime should shuffle-join the count tables:\n$plan")
      assert(a.sameElements(b), "join regimes disagree on output")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bigramSurprisal precomputed tables: OOV pair/context/word branches hand-checked") {
    // reference corpus: "a b a b" -> c(a,b)=2, c(b,a)=1; contexts a=2,
    // b=1; unigrams a=2, b=2, T=4
    val ref = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val bg = graft.llmops.TextAnalysis.bigramCounts(ref, "text")
    val ug = graft.llmops.TextAnalysis.unigramVocab(ref, "text")
    // scored batch: (a,b) fully known; (b,z) known context, unseen pair,
    // OOV word; (z,a) unseen context, known word
    val batch = Seq((10L, "a b z"), (11L, "z a")).toDF("doc_id", "text")
    val out = graft.llmops.TextAnalysis.bigramSurprisal(
      batch, "doc_id", "text", bg, ug, lambda = 0.75, maxBroadcastVocab = 10000000L)
      .collect().map(r => r.getLong(0) -> r).toMap
    def sr6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val pAB = 0.75 * (2.0 / 2.0) + 0.25 * 2.0 / 4.0 // known pair
    val pBZ = 0.25 * 1.0 / 4.0                      // unseen pair + OOV word floor
    val pZA = 0.25 * 2.0 / 4.0                      // unseen context, known word
    assert(out(10L).getAs[Long]("n_bigrams") === 2)
    assert(out(10L).getAs[Double]("surprisal") ===
      sr6((-math.log(pAB) - math.log(pBZ)) / 2.0))
    assert(out(11L).getAs[Double]("surprisal") === sr6(-math.log(pZA)))
  }

  test("bigramSurprisal: self-computed form == precomputed form fed its own tables") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
    val self = graft.llmops.TextAnalysis.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val pre = graft.llmops.TextAnalysis.bigramSurprisal(
      docs, "doc_id", "text",
      graft.llmops.TextAnalysis.bigramCounts(docs, "text"),
      graft.llmops.TextAnalysis.unigramVocab(docs, "text"),
      lambda = 0.75, maxBroadcastVocab = 10000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(self.sameElements(pre), "delegation must be exact")
  }

  // ---- BM25 ----

  test("bm25: hand-computed score on a three-doc corpus") {
    // docs: d1 has the term twice of length 4, d2 once of length 2, d3 none
    val docs = Seq(
      (1L, "cat dog cat bird"),
      (2L, "cat fish"),
      (3L, "horse cow pig")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopDocs(docs, "doc_id", "text", Seq("cat"), k = 10)
      .orderBy(col("rank")).collect()
    // N=3, df=2 → idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    // avgdl = (4+2+3)/3 = 3.0
    val idf = math.floor(math.log(1.6) * 1e6 + 0.5) / 1e6
    def tfn(tf: Long, dl: Long): Double = {
      val raw = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
      math.floor(raw * 1e6 + 0.5) / 1e6
    }
    def score(tf: Long, dl: Long): Double =
      math.floor(idf * tfn(tf, dl) * 1e6 + 0.5) / 1e6
    assert(out.length === 2) // d3 matches nothing, never appears
    assert(out(0).getAs[Long]("doc_id") === 1L)
    assert(out(0).getAs[Double]("score") === score(2, 4))
    assert(out(1).getAs[Long]("doc_id") === 2L)
    assert(out(1).getAs[Double]("score") === score(1, 2))
    assert(out.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L))
  }

  test("bm25: rarer term outscores a common term at equal tf/dl") {
    val docs = Seq(
      (1L, "rare common x"), (2L, "common x y"), (3L, "common y z"),
      (4L, "common z w")).toDF("doc_id", "text")
    val scores = Retrieval.bm25TermScores(docs, "doc_id", "text",
        Seq("rare", "common"))
      .filter(col("doc_id") === 1L)
      .select(col("term"), col("score_micros")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(scores("rare") > scores("common"))
  }

  test("bm25: ties broken by ascending doc id and k respected") {
    val docs = Seq(
      (5L, "cat dog"), (2L, "cat dog"), (9L, "cat dog"), (7L, "bird"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopDocs(docs, "doc_id", "text", Seq("cat"), k = 2)
      .orderBy(col("rank")).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(2L, 5L))
  }

  // ---- Chunking ----

  test("slidingChunks: exact windows, short tail, overlap") {
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text")
    // chunk=4, overlap=1 → step=3 → starts 0,3,6
    val out = Chunking.slidingChunks(docs, "doc_id", "text", 4, 1)
      .orderBy(col("chunk_idx")).collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[Int]("start_token")).toSeq === Seq(0, 3, 6))
    assert(out.map(_.getAs[Int]("n_tokens")).toSeq === Seq(4, 4, 1))
    assert(out.map(_.getAs[String]("chunk_text")).toSeq ===
      Seq("t0 t1 t2 t3", "t3 t4 t5 t6", "t6"))
    assert(out.map(_.getAs[Int]("chunk_idx")).toSeq === Seq(0, 1, 2))
  }

  test("slidingChunks: doc shorter than one chunk emits one chunk; empty doc none") {
    val docs = Seq((1L, "a b"), (2L, "   "), (3L, "")).toDF("doc_id", "text")
    val out = Chunking.slidingChunks(docs, "doc_id", "text", 8, 2).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("doc_id") === 1L)
    assert(out.head.getAs[Int]("n_tokens") === 2)
    assert(out.head.getAs[String]("chunk_text") === "a b")
  }

  test("slidingChunks: zero overlap tiles the doc exactly; guards reject bad params") {
    val docs = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Chunking.slidingChunks(docs, "doc_id", "text", 5, 0)
      .orderBy(col("chunk_idx")).collect()
    assert(out.map(_.getAs[Int]("start_token")).toSeq === Seq(0, 5))
    assert(out.map(_.getAs[Int]("n_tokens")).toSeq === Seq(5, 5))
    intercept[IllegalArgumentException] {
      Chunking.slidingChunks(docs, "doc_id", "text", 4, 4)
    }
    intercept[IllegalArgumentException] {
      Chunking.slidingChunks(docs, "doc_id", "text", 0, 0)
    }
  }

  test("bm25: precomputed-stats overload == self-contained, row for row") {
    import graft.llmops.TextAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val terms = Seq("dup", "key", "window")
    val stats = docs.agg(
      count(lit(1)).as("n"),
      avg(TextAnalysis.tokenCount(col("text")).cast("long")).as("avgdl")).collect()(0)
    val n = stats.getLong(0)
    val avgdl = math.floor(stats.getDouble(1) * 1e6 + 0.5) / 1e6
    val self = Retrieval.bm25TopDocs(docs, "doc_id", "text", terms, 10)
    val pre = Retrieval.bm25TopDocs(docs, "doc_id", "text", terms, 10, n, avgdl)
    assert(self.exceptAll(pre).count() === 0 && pre.exceptAll(self).count() === 0)
  }

  test("null and empty text: bm25/chunking/bpe/quality degrade gracefully, never throw") {
    import graft.llmops.TextAnalysis
    val docs = Seq((1L, null: String), (2L, ""), (3L, "   "), (4L, "cat dog"))
      .toDF("doc_id", "text")
    // bm25: null/empty docs contribute no matches and a null/zero dl to
    // the stats; the one matching doc still scores
    val bm = Retrieval.bm25TopDocs(docs, "doc_id", "text", Seq("cat"), 5).collect()
    assert(bm.map(_.getAs[Long]("doc_id")).toSeq === Seq(4L))
    // chunking: null and whitespace-only docs emit nothing
    val ch = Chunking.slidingChunks(docs, "doc_id", "text", 4, 1).collect()
    assert(ch.map(_.getAs[Long]("doc_id")).toSeq === Seq(4L))
    // bpe: only real words contribute pairs
    val bp = Bpe.pairStats(docs, "text", 10).collect()
    assert(bp.map(_.getAs[String]("pair")).sorted.toSeq === Seq("at", "ca", "do", "og"))
    // quality: null text yields a null probability, not an exception
    val q = docs.select(col("doc_id"),
      TextAnalysis.logisticQualityScore(col("text"), Seq("the")).as("p")).collect()
    assert(q.find(_.getLong(0) == 1L).exists(_.isNullAt(1)))
    assert(q.find(_.getLong(0) == 4L).exists(!_.isNullAt(1)))
  }

  // ---- Semantic dedup ----

  test("semanticDedupAssignments: transitive cluster collapses to min id; singletons kept") {
    val items = (1L to 6L).toDF("vec_id")
    val pairs = Seq((2L, 3L), (3L, 5L), (4L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.semanticDedupAssignments(items.toDF(), "vec_id", pairs)
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rep_id"),
        r.getAs[Boolean]("kept")))
    assert(out.toSeq === Seq(
      (1L, 1L, true), (2L, 2L, true), (3L, 2L, false),
      (4L, 4L, true), (5L, 2L, false), (6L, 4L, false)))
  }

  test("semanticDedupAssignments: kept set has exactly one representative per cluster") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.4)
    val out = Dedup.semanticDedupAssignments(emb, "vec_id", pairs).cache()
    try {
      val perRep = out.groupBy(col("rep_id"))
        .agg(sum(when(col("kept"), 1).otherwise(0)).as("n_kept"))
      assert(perRep.filter(col("n_kept") =!= 1).count() === 0)
      assert(out.count() === emb.count())
    } finally out.unpersist()
  }

  // ---- BPE pairs ----

  test("pairStats: hand-counted frequencies with overlap and word weighting") {
    // "aaa" x2 → pair "aa" twice per occurrence = 4; "ab" in "ab" x3 = 3
    val docs = Seq((1L, "aaa ab ab"), (2L, "aaa ab x")).toDF("doc_id", "text")
    val out = Bpe.pairStats(docs, "text", k = 10)
      .orderBy(col("rank")).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("freq"),
        r.getAs[Long]("n_words")))
    // single-char word "x" contributes nothing
    assert(out.toSeq === Seq(("aa", 4L, 1L), ("ab", 3L, 1L)))
  }

  // ---- Logistic quality ----

  test("logisticQualityScore: hand-computed probability and monotone stopword effect") {
    import graft.llmops.TextAnalysis
    val sw = Seq("the", "a", "and", "of", "to")
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog"), // stopword-rich
      (2L, "zxqw vbnm asdf ghjk qwer tyui")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      TextAnalysis.logisticQualityScore(col("text"), sw).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // doc 1 by hand: len=34, ntok=9, punct=0, stopwords(the,on?no) ->
    // toks lower: the,cat,sat,on,the,mat,and,the,dog -> sw hits the(3)+and(1)=4/9
    val f1 = r6(math.min(34.0 / 500.0, 1.0)); val f2 = r6(34.0 / 9.0)
    val f3 = r6(0.0); val f4 = r6(4.0 / 9.0)
    val z = r6(-1.5 + 2.0 * f1 + 0.15 * f2 + -4.0 * f3 + 3.0 * f4)
    assert(out(1L) === r6(1.0 / (1.0 + math.exp(-z))))
    assert(out(1L) > out(2L), "stopword-rich text must outscore gibberish")
  }

  test("chunk->pack composite: every bin within the streaming-packing bound") {
    import graft.llmops.{Chunking, Packing}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val chunks = Chunking.slidingChunks(docs, "doc_id", "text", 64, 16)
    val bins = Packing.packSequences(chunks, col("n_tokens"), budget = 256,
        shardCol = pmod(col("doc_id"), lit(4)),
        orderCols = Seq(col("doc_id"), col("chunk_idx")))
      .groupBy(col("shard"), col("bin")).agg(sum(col("tokens")).as("t"))
    // bound: budget + max single-chunk size (one straddling chunk)
    assert(bins.filter(col("t") > 256 + 64).count() === 0)
    // conservation: packed token total equals the chunk token total
    val packed = bins.agg(sum(col("t"))).collect()(0).getLong(0)
    val raw = chunks.agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    assert(packed === raw)
  }

  test("pairStats: rank is total on (freq desc, pair asc)") {
    val docs = Seq((1L, "ab cd ab cd ef")).toDF("doc_id", "text")
    val out = Bpe.pairStats(docs, "text", k = 2).collect()
      .sortBy(_.getAs[Long]("rank"))
      .map(_.getAs[String]("pair"))
    assert(out.toSeq === Seq("ab", "cd")) // ef tied with nothing; ab<cd at freq 2
  }

  test("repeatedNgramSpans: shared passage found case-insensitively, overlapping windows merge into one span") {
    // A and B share a 9-token passage (B's copy uppercased — the
    // word_ngrams lowercase contract must still match it); C is
    // unrelated. At n=8 the passage yields two overlapping duplicated
    // windows per doc, which must merge into ONE span covering 9 tokens.
    val common = (1 to 9).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$common onlyA1 onlyA2"),
      (2L, s"onlyB0 ${common.toUpperCase}"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")).toDF("doc_id", "text")
    val out = graft.llmops.SpanDedup
      .repeatedNgramSpans(docs, "doc_id", "text", n = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet === Set(1L, 2L), s"only the sharing docs appear: $out")
    assert(out(1L) === ((4L, 2L, 1L, 9L)),
      s"A: 4 windows, 2 duplicated, 1 merged span covering 9 tokens: ${out(1L)}")
    assert(out(2L) === ((3L, 2L, 1L, 9L)), s"B: ${out(2L)}")
  }

  test("repeatedNgramSpans: disjoint repeats stay separate spans") {
    // two shared 8-token passages separated by >7 unique tokens must
    // NOT merge (span break at gap > n-1 positions)
    val p1 = (1 to 8).map(i => s"a$i").mkString(" ")
    val p2 = (1 to 8).map(i => s"b$i").mkString(" ")
    val gap = (1 to 9).map(i => s"gA$i").mkString(" ")
    val docs = Seq(
      (1L, s"$p1 $gap $p2"),
      (2L, s"$p1 zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8 zz9 $p2")).toDF("doc_id", "text")
    val out = graft.llmops.SpanDedup
      .repeatedNgramSpans(docs, "doc_id", "text", n = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) === ((2L, 16L)), s"two 8-token spans, 16 tokens covered: $out")
    assert(out(2L) === ((2L, 16L)), s"two 8-token spans, 16 tokens covered: $out")
  }

  private def collectCut(docs: org.apache.spark.sql.DataFrame) =
    graft.llmops.SpanDedup
      .cutRepeatedSpans(docs, "doc_id", "text", n = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap

  test("cutRepeatedSpans: KEEP-FIRST policy — lowest (doc_id, pos) occurrence survives, all others are excised") {
    val p = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, p),                       // canonical owner (lowest doc_id)
      (2L, s"x $p"),                 // later doc: passage excised
      // later doc carrying the passage TWICE: both occurrences cut
      // (keep ONE corpus-wide, not one per doc)
      (5L, s"$p q1 q2 q3 q4 q5 q6 q7 q8 $p")).toDF("doc_id", "text")
    val out = collectCut(docs)
    assert(out(1L) === ((8L, 0L, 0L, p)), s"canonical doc untouched: ${out(1L)}")
    assert(out(2L) === ((9L, 8L, 1L, "x")), s"later copy excised: ${out(2L)}")
    assert(out(5L) === ((24L, 16L, 2L, "q1 q2 q3 q4 q5 q6 q7 q8")),
      s"both later occurrences excised as two spans: ${out(5L)}")
  }

  test("cutRepeatedSpans: kept-wins overlap protection — a cut window cannot chew through a canonical occurrence") {
    // doc1 holds the CANONICAL occurrence of G1 = a1..a8 at pos 0 and a
    // NON-canonical occurrence of G2 = a2..a9 at pos 1 (doc0 owns G2).
    // Cutting G2's window [1..8] must not destroy G1's kept window
    // [0..7]: only position 8 (a9) is excised.
    val g2 = (2 to 9).map(i => s"a$i").mkString(" ")
    val g1 = (1 to 8).map(i => s"a$i").mkString(" ")
    val docs = Seq(
      (0L, g2),                        // canonical owner of G2
      (1L, (1 to 9).map(i => s"a$i").mkString(" ")), // G1 kept, G2 cut
      (9L, g1)                         // makes G1 duplicated; fully excised
    ).toDF("doc_id", "text")
    val out = collectCut(docs)
    assert(out(0L) === ((8L, 0L, 0L, g2)), s"G2 owner untouched: ${out(0L)}")
    assert(out(1L) === ((9L, 1L, 1L, g1)),
      s"overlap-protected: only a9 excised: ${out(1L)}")
    assert(out(9L) === ((8L, 8L, 1L, "")),
      s"non-canonical G1 copy fully excised to empty: ${out(9L)}")
  }

  test("cutRepeatedSpans: untouched documents come back whitespace-normalized, case preserved") {
    val docs = Seq(
      (1L, "  Mixed   CASE\ttokens  here "),
      (2L, "short doc")).toDF("doc_id", "text")
    val out = collectCut(docs)
    assert(out(1L) === ((4L, 0L, 0L, "Mixed CASE tokens here")))
    assert(out(2L) === ((2L, 0L, 0L, "short doc")))
  }

  test("dsirWeights: hand-computed log-likelihood ratio; target-like doc ranks above off-target") {
    // target docs use {aa, bb}; raw-only docs use {zz}. Weight formula
    // replicated by hand: w = sum c*(ln(tc+1)-ln(sc+1)) + n*(ln(sN+V)-ln(tN+V))
    val docs = Seq(
      (1L, "aa bb aa", "en"),
      (2L, "zz zz zz", "xx"),
      (3L, "aa zz", "xx")).toDF("doc_id", "text", "lang")
    val out = graft.llmops.Sampling
      .dsirWeights(docs, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // corpus: aa sc=3 tc=2 (doc1); bb sc=1 tc=1; zz sc=4 tc=0
    // sN=8, tN=3, V=3
    def sr6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val k = math.log(8.0 + 3.0) - math.log(3.0 + 3.0)
    val w1 = 2.0 * (math.log(3.0) - math.log(4.0)) +
      1.0 * (math.log(2.0) - math.log(2.0)) + 3.0 * k
    val w2 = 3.0 * (math.log(1.0) - math.log(5.0)) + 3.0 * k
    val w3 = 1.0 * (math.log(3.0) - math.log(4.0)) +
      1.0 * (math.log(1.0) - math.log(5.0)) + 2.0 * k
    assert(out(1L)._1 === 3L && out(2L)._1 === 3L && out(3L)._1 === 2L)
    assert(math.abs(out(1L)._2 - sr6(w1)) < 1e-9, s"doc1: ${out(1L)} vs $w1")
    assert(math.abs(out(2L)._2 - sr6(w2)) < 1e-9, s"doc2: ${out(2L)} vs $w2")
    assert(math.abs(out(3L)._2 - sr6(w3)) < 1e-9, s"doc3: ${out(3L)} vs $w3")
    assert(out(1L)._2 > out(3L)._2 && out(3L)._2 > out(2L)._2,
      s"target-likeness must order the docs: $out")
  }
}
