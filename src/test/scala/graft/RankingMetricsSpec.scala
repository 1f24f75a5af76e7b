package graft

import org.apache.spark.sql.functions._

import graft.llmops.{AnnIndex, Retrieval}

/** X100/X101 unit pins: retrieval-metrics arithmetic on hand-checkable
  * fixtures, and the maintenance policy's quiet branch (q241 pins the
  * recluster/refit branches against the oracle).
  */
class RankingMetricsSpec extends SparkSpec {

  test("rankingMetrics: hand-checked recall/MRR/nDCG on a tiny fixture") {
    import spark.implicits._
    // query 1: truth = {a:3, b:1, c:2}; ranking = [b, x, c] (k=3)
    //   recall = 2/3; mrr = 1/1; dcg = 1/ln2 + 0 + 2/ln4
    //   ideal  = 3/ln2 + 2/ln3 + 1/ln4
    val ranking = Seq((1L, "b", 1L), (1L, "x", 2L), (1L, "c", 3L))
      .toDF("qid", "id", "rank")
    val truth = Seq((1L, "a", 3L), (1L, "b", 1L), (1L, "c", 2L))
      .toDF("qid", "id", "grade")
    val r = Retrieval.rankingMetrics(ranking, truth, "qid", "id", "rank", "grade", k = 3)
      .collect()(0)
    def micros(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val dcg = micros(1.0 / math.log(2)) + micros(2.0 / math.log(4))
    val idcg = micros(3.0 / math.log(2)) + micros(2.0 / math.log(3)) + micros(1.0 / math.log(4))
    def sr6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getAs[Long]("n_rel") === 3L && r.getAs[Long]("n_hits") === 2L)
    assert(r.getAs[Double]("recall_k") === sr6(2.0 / 3.0))
    assert(r.getAs[Double]("mrr_k") === 1.0)
    assert(r.getAs[Double]("ndcg_k") === sr6(dcg.toDouble / idcg.toDouble))
  }

  test("rankingMetrics: a query whose ranking finds nothing relevant scores zero") {
    import spark.implicits._
    val ranking = Seq((1L, "x", 1L), (1L, "y", 2L)).toDF("qid", "id", "rank")
    val truth = Seq((1L, "a", 1L)).toDF("qid", "id", "grade")
    val r = Retrieval.rankingMetrics(ranking, truth, "qid", "id", "rank", "grade", k = 10)
      .collect()(0)
    assert(r.getAs[Long]("n_hits") === 0L)
    assert(r.getAs[Double]("recall_k") === 0.0)
    assert(r.getAs[Double]("mrr_k") === 0.0)
    assert(r.getAs[Double]("ndcg_k") === 0.0)
  }

  test("rankingMetrics: duplicate (qid, id) in the ranking fails loudly") {
    import spark.implicits._
    val ranking = Seq((1L, "a", 1L), (1L, "a", 2L)).toDF("qid", "id", "rank")
    val truth = Seq((1L, "a", 1L)).toDF("qid", "id", "grade")
    val e = intercept[Exception] {
      Retrieval.rankingMetrics(ranking, truth, "qid", "id", "rank", "grade", k = 10).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("rankingMetrics ranking"), chain)
  }

  test("maintainIvfIndex: a healthy compact index takes the 'none' branch untouched") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("maint_none_").toString
    val refit = java.nio.file.Files.createTempDirectory("maint_none_refit_").toString
    AnnIndex.fitIvfIndex(emb, "vec_id", "embedding", 64, nCells = 16, path)
    val v = AnnIndex.assignmentsVersion(path)
    val r = AnnIndex.maintainIvfIndex(spark, path, refit, v,
      reclusterFileThreshold = 64).collect()(0)
    assert(r.getAs[String]("action") === "none", r.toString)
    assert(!r.getAs[Boolean]("refit_due"))
    assert(r.getAs[Long]("n_indexed_out") === emb.count())
    // nothing was written to the refit path, the live path unchanged
    assert(graft.sources.TxParquetTable.latestVersion(s"$refit/assignments") < 0)
    assert(AnnIndex.assignmentsVersion(path) === v)
  }
}
