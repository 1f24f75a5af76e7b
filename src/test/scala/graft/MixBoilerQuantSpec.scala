package graft

import org.apache.spark.sql.functions._

import graft.llmops.{Boilerplate, Sampling, Similarity}

class MixBoilerQuantSpec extends SparkSpec {
  import spark.implicits._

  test("boilerplateStats: the repeated footer trigram is flagged, unique text is not") {
    val docs = Seq(
      (1L, "alpha beta gamma all rights reserved"),
      (2L, "delta epsilon zeta all rights reserved"),
      (3L, "eta theta iota all rights reserved"),
      (4L, "unique words only here nothing shared")
    ).toDF("doc_id", "text")
    val out = Boilerplate.boilerplateStats(docs, "doc_id", "text", 3, minDf = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // "all rights reserved" appears in 3 docs -> boilerplate
    assert(out(1L).getAs[Long]("n_boiler") === 1)
    assert(out(4L).getAs[Long]("n_boiler") === 0)
    assert(out(4L).getAs[Double]("boiler_frac") === 0.0)
    // doc 1 has 4 distinct trigrams, 1 boiler
    assert(out(1L).getAs[Long]("n_grams") === 4)
    assert(out(1L).getAs[Double]("boiler_frac") === 0.25)
  }

  test("boilerplateGrams df counts each doc once even when a gram repeats in-doc") {
    val docs = Seq(
      (1L, "x y z x y z x y z"), // "x y z" repeats inside ONE doc
      (2L, "a b c d e f")
    ).toDF("doc_id", "text")
    val grams = Boilerplate.boilerplateGrams(docs, "doc_id", "text", 3, minDf = 2)
    assert(grams.count() === 0) // in-doc repetition is not document frequency
  }

  test("coverageStats: overlapping occurrences cover positions once; short docs survive at zero") {
    val docs = Seq(
      // "all rights reserved" in 3 docs -> boilerplate at minDf=3
      (1L, "alpha beta gamma all rights reserved"),          // covers pos 3,4,5 of 6
      (2L, "all rights reserved all rights reserved"),       // occurrences at 0 and 3 PLUS
                                                             // the bridging grams are unique;
                                                             // all 6 positions covered once
      (3L, "eta theta all rights reserved iota"),            // covers pos 2,3,4 of 6
      (4L, "unique words only here nothing shared"),         // no coverage
      (5L, "too short")                                      // < n tokens: zero grams
    ).toDF("doc_id", "text")
    val out = Boilerplate.coverageStats(docs, "doc_id", "text", 3, minDf = 3L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size === 5)                                   // every doc present
    assert(out(1L).getAs[Long]("n_covered") === 3)
    assert(out(1L).getAs[Long]("clean_tokens") === 3)
    assert(out(1L).getAs[Double]("cover_frac") === 0.5)
    assert(out(2L).getAs[Long]("n_covered") === 6)           // overlap counted once
    assert(out(2L).getAs[Long]("clean_tokens") === 0)
    assert(out(3L).getAs[Long]("n_covered") === 3)
    assert(out(4L).getAs[Long]("n_covered") === 0)
    assert(out(4L).getAs[Double]("cover_frac") === 0.0)
    assert(out(5L).getAs[Long]("n_covered") === 0)
    assert(out(5L).getAs[Long]("n_tokens") === 2)
  }

  test("mixtureSample: clamped rates keep small sources whole; budget is approached") {
    val docs = (0 until 2000).map { i =>
      val src = if (i % 10 == 0) "rare" else "common"
      (i.toLong, src, "tok " * 10)
    }.toDF("doc_id", "source", "text")
    val tok = graft.llmops.TextAnalysis.tokenCount(col("text")).cast("long")
    // rare weighted 5x on a 50% budget -> rare's share exceeds its size -> keep all
    val w = when(col("source") === "rare", lit(5.0)).otherwise(lit(1.0))
    val out = Sampling.mixtureSample(docs, "doc_id", "source", tok, w, 0.5)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("rare") === 200)          // rate clamped at 1.0
    // common gets (0.5*T*1/6)/toks_common of its docs ~ 1800 * 0.5*2000*10/6/18000 = 166
    assert(bySrc("common") > 100 && bySrc("common") < 250)
    // deterministic: same call yields the identical sample
    val again = Sampling.mixtureSample(docs, "doc_id", "source", tok, w, 0.5)
    assert(out.select("doc_id").except(again.select("doc_id")).count() === 0)
    assert(again.select("doc_id").except(out.select("doc_id")).count() === 0)
  }

  test("temperatureMixtureSample: sqrt shares flatten the mixture; deterministic") {
    // common is 10x rare by tokens; at alpha=1/2 its budget share is only
    // sqrt(10)x, so its KEEP RATE must come out well below rare's
    val docs = (0 until 2200).map { i =>
      val src = if (i % 11 == 0) "rare" else "common"
      (i.toLong, src, "tok " * 10)
    }.toDF("doc_id", "source", "text")
    val tok = graft.llmops.TextAnalysis.tokenCount(col("text")).cast("long")
    val out = Sampling.temperatureMixtureSample(docs, "doc_id", "source", tok, 0.3)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rareRate = bySrc("rare").toDouble / 200
    val commonRate = bySrc("common").toDouble / 2000
    // closed form: T=22000, w ∝ sqrt(toks); rate(rare) ≈ min(1, .3*22000*sqrt(2000)
    //   /(sqrt(2000)+sqrt(20000))/2000) ≈ .79; rate(common) ≈ .25
    assert(rareRate > commonRate * 2, s"rare $rareRate vs common $commonRate")
    assert(rareRate > 0.6 && rareRate < 1.0, rareRate)
    assert(commonRate > 0.15 && commonRate < 0.4, commonRate)
    // deterministic: identical sample on re-evaluation
    val again = Sampling.temperatureMixtureSample(docs, "doc_id", "source", tok, 0.3)
    assert(out.select("doc_id").except(again.select("doc_id")).count() === 0)
    assert(again.select("doc_id").except(out.select("doc_id")).count() === 0)
  }

  test("temperatureMixtureSample: zero-token source kept whole under ANSI") {
    val docs = Seq(
      (1L, "empty", ""), (2L, "empty", ""),
      (3L, "full", "a b c d e f g h"), (4L, "full", "a b c d e f g h")
    ).toDF("doc_id", "source", "text")
    val tok = graft.llmops.TextAnalysis.tokenCount(col("text")).cast("long")
    val out = Sampling.temperatureMixtureSample(docs, "doc_id", "source", tok, 1.0)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("empty") === 2)   // rate 1 by convention, not a div-by-zero
    assert(bySrc.getOrElse("full", 0L) === 2)  // budget 1.0 -> keep all
  }

  test("fuzzyMatchPairs: blocked edit-distance linkage finds typos, respects blocks") {
    val recs = Seq(
      (1L, "jon smith", "b1"),
      (2L, "john smith", "b1"),   // dist 1 from jon smith
      (3L, "jane doe", "b1"),     // dist > 2 from both
      (4L, "jon smith", "b2")     // identical name, DIFFERENT block -> never compared
    ).toDF("id", "name", "blk")
    val out = graft.llmops.Dedup.fuzzyMatchPairs(recs, "id", "name", col("blk"), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq === Seq((1L, 2L, 1)))
  }

  test("contrastivePairs: positives share the query label, hard negatives never do") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"),
        graft.llmops.Similarity.asDouble(col("embedding")).as("qv"), col("label").as("qlbl"))
    val out = graft.llmops.Similarity.contrastivePairs(
        emb, "vec_id", "embedding", "label", queries, "qid", "qv", "qlbl", k = 5)
      .collect()
    assert(out.length === 30)                       // 3 queries x 2 sides x 5
    out.foreach { r =>
      val (qid, same, id) = (r.getLong(0), r.getInt(1), r.getLong(2))
      assert((labels(id) == labels(qid)) == (same == 1),
        s"label-match flag wrong for qid=$qid id=$id")
      assert(id != qid)
    }
    // TRUE top-k property: within each (query, side) the returned scores
    // must dominate every non-returned same-side score (brute force)
    val scoredAll = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), (col("label") === col("qlbl")).cast("int").as("same"),
        col("vec_id").as("id"),
        graft.util.Partitioning.stableRound6(
          graft.llmops.Similarity.dot(
            graft.llmops.Similarity.asDouble(col("embedding")), col("qv"))
            / (graft.llmops.Similarity.norm(graft.llmops.Similarity.asDouble(col("embedding")))
              * graft.llmops.Similarity.norm(col("qv")))).as("score"))
      .collect().groupBy(r => (r.getLong(0), r.getInt(1)))
    out.groupBy(r => (r.getLong(0), r.getInt(1))).foreach { case (key, rows) =>
      assert(rows.length === 5)
      val returnedIds = rows.map(_.getLong(2)).toSet
      val minReturned = rows.map(_.getDouble(3)).min
      val bestExcluded = scoredAll(key).filterNot(r => returnedIds(r.getLong(2)))
        .map(_.getDouble(3)).max
      assert(minReturned >= bestExcluded,
        s"$key: returned min $minReturned < excluded max $bestExcluded")
    }
  }

  test("unigramSurprisal: common-token docs score low, rare-token docs high") {
    val docs = (
      (1 to 50).map(i => (i.toLong, "the the the the")) ++        // dominant token
        Seq((100L, "the the the the"), (101L, "zyx qwv jkl pmn")) // one rare-token doc
      ).toDF("doc_id", "text")
    val out = graft.llmops.TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(100L).getAs[Double]("surprisal") < out(101L).getAs[Double]("surprisal"))
    assert(out(100L).getAs[Long]("n_tokens") === 4)
    // every doc scored, none dropped by the frequency join
    assert(out.size === 52)
    // surprisal is -avg ln p: for the rare doc each token has count 1 of T
    val T = 51 * 4 + 4
    assert(math.abs(out(101L).getAs[Double]("surprisal") - math.log(T.toDouble)) < 1e-5)
  }

  test("misraGries never evicts an item above the n/k guarantee; recount equals full groupBy") {
    // stream: 600 of 'a', 300 of 'b', 100 singletons -> k=4 must keep a and b
    val stream = Seq.fill(600)("a") ++ Seq.fill(300)("b") ++ (1 to 100).map(i => s"x$i")
    val survivors = graft.llmops.HeavyHitters.misraGries(
      scala.util.Random.shuffle(stream).iterator, 4).toSet
    assert(survivors.contains("a") && survivors.contains("b"))
    assert(survivors.size <= 4)

    // end-to-end equals the brute-force definition on the harness corpus
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fast = graft.llmops.HeavyHitters.heavyHitterTokens(docs, "text", 40)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = docs.select(explode(graft.llmops.TextAnalysis.tokens(col("text"))).as("tok"))
    val n = toks.count()
    val brute = toks.groupBy("tok").count()
      .filter(col("count") * 40 > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fast === brute)
    assert(fast.nonEmpty, "expected at least one heavy hitter at k=40 on the harness corpus")
  }

  test("incremental minhash dedup equals the cross-split slice of the full self-join") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val isOld = col("source").isin((0 to 9).map(i => s"src$i"): _*)
    val oldIds = docs.filter(isOld).select("doc_id").as[Long].collect().toSet
    val full = graft.llmops.Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // keep pairs with one endpoint per side, normalized to (new, old)
      .collect {
        case (a, b, n) if oldIds(a) ^ oldIds(b) =>
          (if (oldIds(a)) b else a, if (oldIds(a)) a else b, n)
      }.toSet
    val inc = graft.llmops.Dedup.minhashPairsAgainst(
        docs.filter(!isOld), docs.filter(isOld), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc === full)
  }

  test("mixtureSample survives a zero-token source under ANSI (kept whole)") {
    val docs = Seq(
      (1L, "empty", ""), (2L, "empty", "   "),          // zero tokens
      (3L, "full", "a b c"), (4L, "full", "d e f")
    ).toDF("doc_id", "source", "text")
    val tok = graft.llmops.TextAnalysis.tokenCount(col("text")).cast("long")
    val out = Sampling.mixtureSample(docs, "doc_id", "source", tok, lit(1.0), 1.0)
    // no divide-by-zero; the vacuous source keeps all rows
    assert(out.filter(col("source") === "empty").count() === 2)
  }

  test("int8Quantize: codes are integer-valued doubles within [-127, 127]") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val codes = emb.select(explode(Similarity.int8Quantize(col("embedding"))).as("c"))
    assert(codes.filter(col("c") =!= floor(col("c"))).count() === 0)
    assert(codes.filter(abs(col("c")) > 127).count() === 0)
  }

  test("quantizedTopKBatch approximates exact cosine kNN (recall@10 >= 0.8)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = Similarity.cosineTopKBatch(emb, "vec_id", "embedding",
        queries.select(col("qid"), Similarity.asDouble(col("qv")).as("qv")),
        "qid", "qv", k = 10, excludeSelfId = true)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.quantizedTopKBatch(emb, "vec_id", "embedding",
        queries, "qid", "qv", k = 10, excludeSelfId = true)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall@10 was $recall")
  }
}
