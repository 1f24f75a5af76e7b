package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llmops.Similarity

/** Recall measurement for the IVF-PQ residual composite: exact top-10
  * vs ivfPqRerankTopKBatch at the q140 parameters, per SF, plus the
  * full-probe degeneracy check (nProbe = nCells, shortlist >> k must
  * recover exact exactly). Sets the q140 verdict threshold from
  * measurement, the q112/q133 discipline.
  */
object ProbeIvfPq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = graft.Tables.load(spark, dir, "embeddings").cache()
      val n = emb.count()
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"),
          Similarity.asDouble(col("embedding")).as("qv"))
      val t0 = System.nanoTime()
      val (cents, cb, codes) = Similarity.ivfPqIndex(
        emb, "vec_id", "embedding", 64, nCells = 16, m = 16, ksub = 16,
        lloydIters = 1, pqIters = 2)
      val codesC = codes.cache(); codesC.count()
      val tIdx = (System.nanoTime() - t0) / 1e9
      val exact = Similarity.cosineTopKBatch(emb, "vec_id", "embedding",
        queries, "qid", "qv", k = 10, excludeSelfId = true)
        .select(col("qid"), col("id"))
      for (nProbe <- Seq(4, 8, 16); shortlist <- Seq(100, 200)) {
        val t1 = System.nanoTime()
        val approx = Similarity.ivfPqRerankTopKBatch(cents, cb, codesC,
          emb, "vec_id", "embedding", queries, "qid", "qv",
          k = 10, shortlist = shortlist, nProbe = nProbe, excludeSelfId = true)
          .select(col("qid"), col("id"))
        val hit = exact.intersect(approx).count()
        val tot = exact.count()
        println(f"[ivfpq] $dir n=$n nProbe=$nProbe shortlist=$shortlist " +
          f"recall=${hit.toDouble / tot}%.3f ($hit/$tot) " +
          f"t=${(System.nanoTime() - t1) / 1e9}%.2f idx=$tIdx%.2f")
      }
      emb.unpersist(); codesC.unpersist()
    }
    spark.stop()
  }
}
