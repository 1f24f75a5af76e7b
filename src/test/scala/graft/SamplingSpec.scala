package graft

import org.apache.spark.sql.functions._

import graft.llmops.Sampling
import graft.util.Partitioning

class SamplingSpec extends SparkSpec {

  test("budgetSelect: full levels whole, boundary level in id order, budget never exceeded") {
    import spark.implicits._
    // levels: 0.9 -> docs 1,2 (10 tok each); 0.5 -> 3,4,5; 0.1 -> 6.
    // budget = 0.5*60 = 30: level .9 full (20), level .5 partial rem 10
    // -> doc 3 only; level .1 excluded
    val docs = Seq(
      (1L, 0.9, 10L), (2L, 0.9, 10L),
      (3L, 0.5, 10L), (4L, 0.5, 10L), (5L, 0.5, 10L),
      (6L, 0.1, 10L)
    ).toDF("doc_id", "score", "ntok")
    val kept = Sampling.budgetSelect(docs, "doc_id", col("ntok"), col("score"), 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L))
    // budget 1.0 keeps everything; determinism across repartition
    val all = Sampling.budgetSelect(docs.repartition(5), "doc_id",
      col("ntok"), col("score"), 1.0).count()
    assert(all === 6L)
    val again = Sampling.budgetSelect(docs.repartition(3), "doc_id",
      col("ntok"), col("score"), 0.5).select("doc_id").as[Long].collect().toSet
    assert(again === kept)
  }

  test("weightedSamplePerStratum: heavy rows are strongly over-represented") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 1000 light rows (w=1) + 50 heavy rows (w=100): an unweighted pick of
    // 100 would include ~5 heavy rows; E-S weighting should take nearly all
    val df = ((1 to 1000).map(i => (i.toLong, 1.0)) ++ (2001 to 2050).map(i => (i.toLong, 100.0)))
      .toDF("id", "w").withColumn("g", lit("all"))
    val picked = graft.llmops.Sampling.weightedSamplePerStratum(df, "g", "id", col("w"), 100)
    assert(picked.count() === 100)
    val heavy = picked.filter(col("id") >= 2000L).count()
    assert(heavy >= 40, s"expected nearly all 50 heavy rows in the top 100, got $heavy")
    // deterministic
    val again = graft.llmops.Sampling.weightedSamplePerStratum(df, "g", "id", col("w"), 100)
    assert(picked.select("id").except(again.select("id")).count() === 0)
  }

  test("tokenEntropy extremes: repeated token -> 0, all-distinct -> ln n") {
    import spark.implicits._
    val docs = Seq((1L, "a a a a"), (2L, "w x y z")).toDF("doc_id", "text")
    val out = graft.llmops.TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("entropy") === 0.0)
    assert(out(1L).getAs[Long]("n_distinct") === 1)
    assert(math.abs(out(2L).getAs[Double]("entropy") - math.log(4.0)) < 1e-5)
    assert(out(2L).getAs[Long]("n_tokens") === 4)
  }
  import spark.implicits._

  test("null ids hash the sentinel: row lands in exactly one split") {
    val df = Seq(Some("a"), Some("b"), None, Some("c")).toDF("id")
    val (train, test) = Sampling.trainTestSplit(df, "id", 0.5)
    // disjoint + exhaustive, including the null-id row
    assert(train.count() + test.count() === 4)
    assert(train.intersect(test).count() === 0)
  }

  test("hashUniform is a pure function of the id (repartition-stable)") {
    val df = spark.range(1000).select(col("id").cast("string").as("id"))
    val a = Sampling.hashSample(df, "id", 0.3).collect().map(_.getString(0)).sorted
    val b = Sampling.hashSample(df.repartition(7), "id", 0.3)
      .collect().map(_.getString(0)).sorted
    assert(a.sameElements(b))
    // fraction lands near its target on a uniform id population
    assert(math.abs(a.length / 1000.0 - 0.3) < 0.06)
  }

  test("sentinel uniform matches the oracle's chr(0) construction") {
    // The DuckDB oracle writes COALESCE(id, chr(0) || 'graft-null-id');
    // assert the Spark sentinel hashes to the same md5 so membership for
    // a null id is engine-independent. (Value checked against DuckDB:
    // md5(chr(0)||'graft-null-id') = e26f930b048f3634440a18b9b6b0b93c.)
    val h = spark.range(1)
      .select(md5(lit(Sampling.NullIdSentinel)).as("h")).head.getString(0)
    assert(h === "e26f930b048f3634440a18b9b6b0b93c")
  }

  test("sampleExactPerStratum: exactly k per stratum, small strata whole, deterministic") {
    import spark.implicits._
    val df = ((1L to 100L).map(i => (i, "big")) ++ Seq((200L, "tiny"), (201L, "tiny")))
      .toDF("id", "s")
    val out = Sampling.sampleExactPerStratum(df, "s", "id", k = 10)
    val byStratum = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum === Map("big" -> 10L, "tiny" -> 2L))
    // deterministic: same pick on re-evaluation and under repartitioning
    val again = Sampling.sampleExactPerStratum(df.repartition(7), "s", "id", k = 10)
    assert(out.select("id").except(again.select("id")).count() === 0)
    assert(again.select("id").except(out.select("id")).count() === 0)
  }

  test("sampleExactPerStratum picks identically to the rank-window form it replaced") {
    // r17 (r16 verdict item 3): the heap delegate with score =
    // -hashUniform(id) must choose EXACTLY the rows
    // row_number() over (partition by s order by hashUniform(id), id) <= k
    // chose — the identical total order, now without a full-stratum sort.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = spark.range(3000).select(
      col("id"), (col("id") % 7).cast("string").as("s"))
    val w = Window.partitionBy(col("s"))
      .orderBy(Sampling.hashUniform(col("id")).asc, col("id").asc)
    val windowForm = df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= 13).select("s", "id")
    val heapForm = Sampling.sampleExactPerStratum(df, "s", "id", k = 13)
      .select("s", "id")
    assert(heapForm.except(windowForm).count() === 0)
    assert(windowForm.except(heapForm).count() === 0)
    assert(heapForm.count() === windowForm.count())
  }

  test("sampleExactPerStratum mega-stratum: a 90%-skewed stratum still samples exactly k") {
    // the same fixture shape as capPerStratum's mega-stratum pin: the
    // heap path must stay exact at any skew (per-task state O(k), no
    // stratum-wide sort)
    import org.apache.spark.sql.functions._
    val df = spark.range(10000).select(
      when(col("id") < 9000L, lit("mega")).otherwise(lit("rest")).as("s"),
      col("id"))
    val out = Sampling.sampleExactPerStratum(df, "s", "id", k = 11)
    val byStratum = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum === Map("mega" -> 11L, "rest" -> 11L))
  }

  test("sampleExactPerStratum: a null id fails loudly (the winners contract)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(50).select(
      when(col("id") === 7L, lit(null).cast("long")).otherwise(col("id")).as("id"),
      lit("s").as("s"))
    val e = intercept[Exception] {
      Sampling.sampleExactPerStratum(df, "s", "id", k = 5).collect()
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("null id"), chain(e))
  }

  test("ensureParallelism repartitions an unknown-stats RDD-backed frame") {
    val rdd = spark.sparkContext.parallelize(Seq(1, 2, 3, 4), 1)
    val df = spark.createDataFrame(rdd.map(org.apache.spark.sql.Row(_)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.IntegerType))))
    val out = Partitioning.ensureParallelism(df)
    assert(out.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism)
    assert(out.count() === 4)
  }

  test("groupAwareSplit: no cluster straddles; singletons match the row split") {
    import spark.implicits._
    val docs = (1L to 50L).toDF("doc_id")
    // clusters {1,2,3} and {4,5}; 6..50 singletons
    val pairs = Seq((1L, 3L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val out = Sampling.groupAwareSplit(docs, pairs, "doc_id", "doc_a", "doc_b", 0.5)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("grp"),
        r.getAs[String]("split")))
    assert(out.length === 50)
    // every member of a cluster lands on the same side
    out.groupBy(_._2).foreach { case (grp, rows) =>
      assert(rows.map(_._3).toSet.size === 1, s"cluster $grp straddles the split")
    }
    // both sides populated at this fraction, and assignment is the
    // group-id hash: singletons agree with plain trainTestSplit
    assert(out.map(_._3).toSet === Set("train", "test"))
    val (tr, te) = Sampling.trainTestSplit(docs, "doc_id", 0.5)
    val trainIds = tr.as[Long].collect().toSet
    out.filter(r => r._1 >= 6L).foreach { case (id, _, split) =>
      assert((split == "train") === trainIds.contains(id),
        s"singleton $id disagrees with trainTestSplit")
    }
  }

  test("capPerStratum: keeps the top-cap by priority with id tiebreak; small strata whole") {
    val df = Seq(
      ("x", 1L, 0.9), ("x", 2L, 0.5), ("x", 3L, 0.5), ("x", 4L, 0.1),
      ("y", 9L, 0.2)
    ).toDF("s", "id", "p")
    val out = Sampling.capPerStratum(df, "s", "id", col("p"), cap = 2)
      .collect().map { r =>
        val rk = if (r.isNullAt(r.fieldIndex("take_rank"))) None
          else Some(r.getAs[Int]("take_rank"))
        r.getAs[Long]("id") -> ((rk, r.getAs[Boolean]("kept")))
      }.toMap
    assert(out(1L) === ((Some(1), true)))
    assert(out(2L) === ((Some(2), true))) // tie at 0.5: lower id wins the cap
    // past the cap: NOT kept, and take_rank is null by contract (r16:
    // ranking losers would need the full-stratum sort the heap removes)
    assert(out(3L) === ((None, false)))
    assert(out(4L) === ((None, false)))
    assert(out(9L) === ((Some(1), true))) // under-cap stratum kept whole
    // string-id (salted two-phase) path agrees with the heap path
    val sdf = df.selectExpr("s", "concat('d', id) AS id", "p")
    val sout = Sampling.capPerStratum(sdf, "s", "id", col("p"), cap = 2)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Boolean]("kept")).toMap
    assert(sout === Map("d1" -> true, "d2" -> true, "d3" -> false,
      "d4" -> false, "d9" -> true), sout.toString)
    // null priority fails loudly instead of ranking silently
    val e = intercept[Exception] {
      Sampling.capPerStratum(
        df.withColumn("p", org.apache.spark.sql.functions.when(
          col("id") === 2L, org.apache.spark.sql.functions.lit(null)
            .cast("double")).otherwise(col("p"))),
        "s", "id", col("p"), cap = 2).collect()
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("null priority"), chain(e))
  }

  test("capPerStratum mega-stratum: one stratum holding 90% of the corpus still caps exactly") {
    // the r15 hazard the heap path removes: a dominant stratum used to
    // sort its whole population through one window task; the heap
    // aggregate keeps per-task state at O(cap). Fixture: 9k of 10k rows
    // in one stratum; semantics must be exact at any skew.
    import org.apache.spark.sql.functions._
    val df = spark.range(10000).select(
      when(col("id") < 9000L, lit("mega")).otherwise(lit("rest")).as("s"),
      col("id"),
      (col("id") % 97).cast("double").as("p"))
    val agg = Sampling.capPerStratum(df, "s", "id", col("p"), cap = 7)
      .groupBy("s").agg(
        count(lit(1)).as("n"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("nk"),
        max(when(col("kept"), col("take_rank"))).as("maxrk"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(agg("mega") === ((9000L, 7L, 7)))
    assert(agg("rest") === ((1000L, 7L, 7)))
    // winners are the deterministic (p desc, id asc) top-7 of the mega
    // stratum: p = 96 occurs 93 times in [0, 9000); lowest ids win
    val keptIds = Sampling.capPerStratum(df, "s", "id", col("p"), cap = 7)
      .filter(col("kept") && col("s") === "mega")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keptIds === Set(96L, 193L, 290L, 387L, 484L, 581L, 678L),
      keptIds.toString)
  }

  test("diversityQuotaSample: deterministic buckets, quota enforced per bucket, identical vectors share a bucket") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = graft.llmops.Sampling.diversityQuotaSample(
      emb, "vec_id", "embedding", 64, planes = 4, quota = 5)
    val agg = out.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("kept"), 1).otherwise(0)).as("nk"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(agg.nonEmpty && agg.forall { case (b, _, _) => b >= 0 && b < 16 })
    agg.foreach { case (b, n, nk) =>
      assert(nk === math.min(n, 5L), s"bucket $b: quota must bind at min(n, quota)")
    }
    // deterministic: a second run reproduces every (id, bucket, kept) bit
    val a = out.select("vec_id", "bucket", "kept").collect().toSet
    val b = graft.llmops.Sampling.diversityQuotaSample(
        emb, "vec_id", "embedding", 64, planes = 4, quota = 5)
      .select("vec_id", "bucket", "kept").collect().toSet
    assert(a === b)
    // identical vectors always land the same bucket (sign pattern is a
    // pure function of the vector)
    val dup = emb.limit(1).withColumn("vec_id", lit(-1L)).unionByName(emb.limit(1))
    val buckets = graft.llmops.Sampling.diversityQuotaSample(
        dup, "vec_id", "embedding", 64, planes = 4, quota = 5)
      .select("bucket").collect().map(_.getInt(0)).distinct
    assert(buckets.length === 1, s"same vector, different buckets: ${buckets.toSeq}")
  }
}
