package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llmops.{Similarity, Whitening}

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val model = Whitening.fit(emb, "embedding", k = 32)
      val wh = Whitening.transform(emb, "embedding", "wv", model)
        .select(col("vec_id"), col("wv")).localCheckpoint(true)
      val queries = wh.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("wv").as("qv"))
      val (codebook, codes) = Similarity.pqIndex(wh, "vec_id", "wv", 32, m = 8, ksub = 16)
      val pq = Similarity.pqRerankTopKBatch(codebook, codes, wh, "vec_id", "wv",
        queries, "qid", "qv", k = 10, shortlist = 200, excludeSelfId = true)
        .select(col("qid"), col("id"))
      val exact = Similarity.cosineTopKBatch(wh, "vec_id", "wv",
        queries, "qid", "qv", k = 10, excludeSelfId = true)
        .select(col("qid"), col("id"))
      val hit = exact.join(pq, Seq("qid", "id")).count()
      val tot = exact.count()
      println(s"[probe] $dir recall=${hit.toDouble / tot} ($hit/$tot)")
    }
    spark.stop()
  }
}
