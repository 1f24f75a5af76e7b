package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.analytics.TimeSeries
import graft.ingest.Ingest

/** Property-based invariants (SURVEY §5.4) over ScalaCheck-generated data:
  * dedup idempotence, candle invariants, coarse-from-fine re-aggregation.
  * Generators are sampled with fixed seeds (scalatestplus bridge isn't in
  * the offline dependency cache, so sampling is driven manually).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowGen: Gen[(Long, String, Double, Int)] = for {
    seq <- Gen.choose(0L, 50L)
    key <- Gen.oneOf("A", "B", "C")
    v <- Gen.choose(-100.0, 100.0)
    vol <- Gen.choose(1, 10)
  } yield (seq, key, v, vol)

  private def sample(n: Int, seed: Long): List[(Long, String, Double, Int)] =
    Gen.listOfN(n, rowGen).apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  test("dedup is idempotent and duplication-invariant: d(xs ++ xs) == d(xs) == d(d(xs))") {
    for (seed <- 1L to 5L) {
      val df = sample(40, seed).toDF("seq", "key", "v", "vol")
      val d1 = Ingest.dedupFirstBy(Seq("key"), "seq")(df)
      val d2 = Ingest.dedupFirstBy(Seq("key"), "seq")(df.union(df))
      val d3 = Ingest.dedupFirstBy(Seq("key"), "seq")(d1)
      assert(d1.exceptAll(d2).count() === 0 && d2.exceptAll(d1).count() === 0, s"seed=$seed")
      assert(d1.exceptAll(d3).count() === 0 && d3.exceptAll(d1).count() === 0, s"seed=$seed")
    }
  }

  test("candle invariants: low <= open,close <= high; volume additive") {
    for (seed <- 1L to 5L) {
      val df = sample(60, seed).toDF("seq", "key", "px", "vol")
        .withColumn("t", expr("timestamp_micros(1700000000000000 + seq * 60000000)"))
      val c = TimeSeries.candles(col("t"), col("key"), col("px"), col("vol"), col("seq"), "5 minutes")(df)
      assert(c.filter(col("low") > col("open") || col("low") > col("close") ||
        col("high") < col("open") || col("high") < col("close")).count() === 0, s"seed=$seed")
      val total = df.agg(sum(col("vol"))).collect()(0).getLong(0)
      val bucketed = c.agg(sum(col("volume"))).collect()(0).getLong(0)
      assert(total === bucketed, s"seed=$seed")
    }
  }

  test("merge as-of join == union+window as-of baseline on random keyed series") {
    for (seed <- 1L to 5L) {
      val left = sample(40, seed).toDF("seq", "key", "v", "vol")
        .withColumn("lts", col("seq") * 10 + col("vol")) // duplicated (key, ts) likely
        .select(col("key"), col("lts").as("ts"), col("v").as("lv"))
      val right = sample(40, seed + 100).toDF("seq", "key", "v", "vol")
        .withColumn("rts", col("seq") * 10 + col("vol"))
        .select(col("key"), col("rts").as("ts"), col("v").as("rv"))
        // unique (key, ts) on the right: with duplicates both forms pick the
        // max payload deterministically, but keep the property crisp
        .groupBy(col("key"), col("ts")).agg(max(col("rv")).as("rv"))
      val baseline = TimeSeries.asOfJoin(left, right, "key", "ts", "ts", Seq("rv"))
        .select(col("key"), col("ts"), col("lv"), col("rv"))
      val merged = plans.MergeAsOf.join(left, right, "key", "ts", "ts")
        .select(col("key"), col("ts"), col("lv"), col("r_rv").as("rv"))
      assert(baseline.exceptAll(merged).count() === 0 &&
        merged.exceptAll(baseline).count() === 0, s"seed=$seed")
    }
  }

  test("10-minute high/low/volume recompose exactly from 5-minute candles") {
    for (seed <- 1L to 5L) {
      val df = sample(60, seed).toDF("seq", "key", "px", "vol")
        .withColumn("t", expr("timestamp_micros(1700000000000000 + seq * 37000000)"))
      val direct = TimeSeries.candles(col("t"), col("key"), col("px"), col("vol"), col("seq"), "10 minutes")(df)
        .select(col("key"), col("bucket_start"), col("high"), col("low"), col("volume"))
      val fine = TimeSeries.candles(col("t"), col("key"), col("px"), col("vol"), col("seq"), "5 minutes")(df)
      val recomposed = fine
        .groupBy(col("key").as("k2"), window(col("bucket_start"), "10 minutes").getField("start").as("b2"))
        .agg(max(col("high")).as("high"), min(col("low")).as("low"), sum(col("volume")).as("volume"))
        .select(col("k2").as("key"), col("b2").as("bucket_start"), col("high"), col("low"), col("volume"))
      assert(direct.exceptAll(recomposed).count() === 0, s"seed=$seed")
      assert(recomposed.exceptAll(direct).count() === 0, s"seed=$seed")
    }
  }

  test("bloom-gated dedup == plain anti-join on random overlapping corpora") {
    val textGen: Gen[(Long, String)] = for {
      id <- Gen.choose(0L, 100000L)
      w <- Gen.choose(0, 60)          // small word space forces real overlap
    } yield (id, s"document body number $w")
    def corpus(n: Int, seed: Long) =
      Gen.listOfN(n, textGen).apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(sys.error("gen failed"))
    for (seed <- 1L to 5L) {
      val hist = corpus(50, seed).toDF("doc_id", "text")
      val inc = corpus(40, seed + 100).toDF("doc_id", "text")
      val gated = graft.llmops.Dedup
        .bloomGatedNewDocs(inc, hist, "text", expectedItems = 50L)
        .select("doc_id", "text")
      val exact = inc.join(
        hist.select(graft.llmops.Dedup.contentHash(col("text")).as("__ch")).distinct(),
        graft.llmops.Dedup.contentHash(col("text")) === col("__ch"), "left_anti")
        .select("doc_id", "text")
      assert(gated.exceptAll(exact).count() === 0, s"seed=$seed")
      assert(exact.exceptAll(gated).count() === 0, s"seed=$seed")
    }
  }

  test("resampleFfill invariants: grid dense per key, fill never null, observed rows unchanged") {
    val barGen: Gen[(String, Int, Double)] = for {
      key <- Gen.oneOf("A", "B")
      slot <- Gen.choose(0, 30)       // 5-min slots with holes
      v <- Gen.choose(-50.0, 50.0)
    } yield (key, slot, v)
    for (seed <- 1L to 5L) {
      val bars = Gen.listOfN(25, barGen).apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(sys.error("gen failed"))
        .map { case (k, slot, v) =>
          (k, new java.sql.Timestamp(1704100000000L + slot * 300000L), v)
        }.distinctBy(t => (t._1, t._2))
        .toDF("key", "bucket_start", "close")
      val out = TimeSeries.resampleFfill(bars, "key", "bucket_start", "close", 300L)
      val rows = out.collect()
      assert(rows.forall(!_.isNullAt(3)), s"seed=$seed: ffill null")
      // grid density: per key, (max-min)/step + 1 rows exactly
      val byKey = rows.groupBy(_.getString(0))
      byKey.foreach { case (k, rs) =>
        val ts = rs.map(_.getTimestamp(1).getTime)
        assert(rs.length === ((ts.max - ts.min) / 300000L + 1),
          s"seed=$seed key=$k grid not dense")
      }
      // observed rows keep their value; ffill equals it there
      val observed = rows.filter(!_.isNullAt(2))
      assert(observed.length === bars.count(), s"seed=$seed observed count")
      assert(observed.forall(r => r.getDouble(2) === r.getDouble(3)), s"seed=$seed")

      // precomputed-bounds overload == self-contained form, row for row
      val viaBounds = TimeSeries.resampleFfill(bars, "key", "bucket_start",
        "close", 300L, 10000000L, TimeSeries.resampleBounds(bars, "key", "bucket_start"))
      assert(viaBounds.exceptAll(out).count() === 0, s"seed=$seed")
      assert(out.exceptAll(viaBounds).count() === 0, s"seed=$seed")
    }
  }

  test("chunking: full coverage, dense indices, lossless reconstruction for any (chunk, overlap)") {
    import graft.llmops.Chunking
    val wordGen = Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)
    val docGen = for {
      n <- Gen.choose(0, 120)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws
    for (seed <- 1L to 5L) {
      val docs = Gen.listOfN(8, docGen).apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(sys.error("gen failed"))
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toDF("doc_id", "text")
      for ((ck, ov) <- Seq((16, 0), (16, 4), (7, 6), (1, 0))) {
        val step = ck - ov
        val rows = Chunking.slidingChunks(df, "doc_id", "text", ck, ov)
          .collect().groupBy(_.getAs[Long]("doc_id"))
        docs.zipWithIndex.foreach { case (ws, i) =>
          val got = rows.getOrElse(i.toLong, Array.empty).sortBy(_.getAs[Int]("chunk_idx"))
          if (ws.isEmpty) assert(got.isEmpty, s"seed=$seed ck=$ck ov=$ov doc=$i")
          else {
            // dense 0..n-1 indices at starts 0, step, 2*step, ... < tc
            assert(got.map(_.getAs[Int]("chunk_idx")).toSeq === got.indices.toSeq)
            assert(got.map(_.getAs[Int]("start_token")).toSeq ===
              got.indices.map(_ * step), s"seed=$seed ck=$ck ov=$ov doc=$i")
            // coverage: last chunk reaches the final token; every chunk
            // non-empty and within the budget
            val last = got.last
            assert(last.getAs[Int]("start_token") + last.getAs[Int]("n_tokens") === ws.length)
            assert(got.forall(r => {
              val n = r.getAs[Int]("n_tokens"); n >= 1 && n <= ck
            }), s"seed=$seed ck=$ck ov=$ov doc=$i")
            // lossless reconstruction: drop each chunk's first `ov`
            // tokens (except chunk 0) and re-concatenate
            val rebuilt = got.zipWithIndex.flatMap { case (r, idx) =>
              val toks = r.getAs[String]("chunk_text").split(" ").toSeq
              if (idx == 0) toks else toks.drop(ov)
            }
            assert(rebuilt.toSeq === ws, s"seed=$seed ck=$ck ov=$ov doc=$i")
          }
        }
      }
    }
  }

  test("token encode: dense vocab ids, exact OOV positions, in-vocab round-trip") {
    import graft.llmops.Tokenize
    val wordGen = Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val docGen = for {
      n <- Gen.choose(0, 40)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws
    for (seed <- 1L to 5L) {
      val docs = Gen.listOfN(10, docGen).apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(sys.error("gen failed"))
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toDF("doc_id", "text")
      val k = (seed % 4 + 1).toInt * 2 // vocab sizes 2..8 over an 8-word universe
      val vocabDf = Tokenize.vocabulary(df, "text", k)
      val rows = vocabDf.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2)))
      // ids dense 1..m (0 reserved); frequency non-increasing in id order
      val byId = rows.sortBy(_._3)
      assert(byId.map(_._3).toSeq === (1L to byId.length).toSeq, s"seed=$seed")
      assert(byId.sliding(2).forall(w => w.length < 2 || w(0)._2 >= w(1)._2),
        s"seed=$seed freq must be non-increasing down the rank")
      val vocab = rows.map(r => r._1 -> r._3).toMap
      val inv = vocab.map(_.swap)
      val enc = Tokenize.encodeWithVocab(df, "text", vocabDf)
        .select(col("doc_id"), col("ids")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      docs.zipWithIndex.foreach { case (ws, i) =>
        val ids = enc(i.toLong)
        assert(ids.length === ws.length, s"seed=$seed doc=$i")
        ws.zip(ids).foreach { case (w, id) =>
          if (vocab.contains(w)) assert(inv(id) === w, s"seed=$seed doc=$i")
          else assert(id === 0L, s"seed=$seed doc=$i OOV word $w got id $id")
        }
      }
    }
  }

  test("groupAwareSplit: disjoint+exhaustive partition, grp-consistent, degenerate fractions") {
    import graft.llmops.Sampling
    val edgeGen = for {
      a <- Gen.choose(0L, 30L)
      b <- Gen.choose(0L, 30L)
    } yield (a, b)
    for (seed <- 1L to 5L) {
      val edges = Gen.listOfN(20, edgeGen).apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(sys.error("gen failed"))
      val docs = (0L to 40L).toDF("doc_id")
      val pairs = edges.toDF("doc_a", "doc_b")
      val out = Sampling.groupAwareSplit(docs, pairs, "doc_id", "doc_a", "doc_b", 0.3)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("grp"),
          r.getAs[String]("split")))
      // exhaustive and disjoint: every doc exactly once, split total
      assert(out.map(_._1).sorted.toSeq === (0L to 40L).toSeq, s"seed=$seed")
      assert(out.forall(r => r._3 == "train" || r._3 == "test"), s"seed=$seed")
      // one side per cluster
      out.groupBy(_._2).foreach { case (grp, rs) =>
        assert(rs.map(_._3).distinct.length === 1, s"seed=$seed grp=$grp straddles")
      }
      // degenerate fractions collapse to one side
      val all0 = Sampling.groupAwareSplit(docs, pairs, "doc_id", "doc_a", "doc_b", 0.0)
        .select("split").distinct().as[String].collect().toSet
      val all1 = Sampling.groupAwareSplit(docs, pairs, "doc_id", "doc_a", "doc_b", 1.0)
        .select("split").distinct().as[String].collect().toSet
      assert(all0 === Set("train") && all1 === Set("test"), s"seed=$seed")
    }
  }

  test("tear sheet is scale-invariant: c * closes leaves returns-derived numbers unchanged") {
    import graft.analytics.Risk
    for (seed <- 1L to 5L) {
      val rows = sample(80, seed).map { case (seq, key, v, _) =>
        (key, seq, 100.0 + math.abs(v)) // positive closes
      }.distinct
      val base = Risk.performanceSummary(
        rows.toDF("sym", "t", "close"), "close", Seq("sym"), Seq("t"))
        .collect().map(r => r.getAs[String]("sym") -> r).toMap
      val scaled = Risk.performanceSummary(
        rows.map { case (k, t, c) => (k, t, c * 4.0) } // 4.0: exact scaling
          .toDF("sym", "t", "close"), "close", Seq("sym"), Seq("t"))
        .collect().map(r => r.getAs[String]("sym") -> r).toMap
      base.keySet.foreach { k =>
        val (b, s) = (base(k), scaled(k))
        // returns, drawdowns and every ratio built from them are
        // homogeneous of degree zero in the price level
        Seq("ann_ret", "ann_vol", "sharpe", "sortino", "max_drawdown", "calmar")
          .foreach { c =>
            assert(b.get(b.fieldIndex(c)) === s.get(s.fieldIndex(c)),
              s"seed=$seed sym=$k col=$c not scale-invariant")
          }
      }
    }
  }
}
