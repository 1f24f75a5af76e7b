package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llmops.Similarity

/** One-off probe: measured PQ-ADC recall@10 vs exact cosine top-10 for
  * the q112 verdict threshold (the ProbeCompanions discipline — measure,
  * then pin the gate with margin).
  */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (sf <- args) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), Similarity.asDouble(col("embedding")).as("qv"))
      for ((m, ksub, iters, c) <- Seq(
          (8, 16, 2, 100), (16, 16, 2, 100), (16, 16, 2, 200), (32, 16, 2, 100))) {
        val (codebook, codes) =
          Similarity.pqIndex(emb, "vec_id", "embedding", 64, m, ksub, iters)
        val pq = Similarity.pqTopKBatch(codebook, codes, queries, "qid", "qv",
          k = c, excludeSelfId = true).select(col("qid"), col("id"))
        val exact = Similarity.cosineTopKBatch(emb, "vec_id", "embedding",
          queries, "qid", "qv", k = 10, excludeSelfId = true)
          .select(col("qid"), col("id"))
        val hits = exact.join(pq.withColumn("h", lit(1)), Seq("qid", "id"), "left")
          .groupBy(col("qid"))
          .agg(count(lit(1)).as("n"), count(col("h")).as("hit"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val total = hits.map(_._3).sum
        val n = hits.map(_._2).sum
        println(s"[pq] sf=$sf m=$m ksub=$ksub iters=$iters C=$c total=$total/$n " +
          hits.sortBy(_._1).map { case (q, nn, h) => s"q$q=$h/$nn" }.mkString(" "))
      }
    }
    spark.stop()
  }
}
