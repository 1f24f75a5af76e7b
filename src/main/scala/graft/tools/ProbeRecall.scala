package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llmops.{Dedup, Similarity}

/** Dev probe: recall of the approximate ANN paths vs their exact twins. */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"vecs=${emb.count()} dim=${emb.select(size(col("embedding"))).head().getInt(0)}")

    // IVF recall@10 over a few fixed query vectors
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val (cent, assigned) = Similarity.ivfIndex(emb, "vec_id", "embedding", dim, nCells = 16)
    assigned.cache(); assigned.count()
    for (qid <- Seq(1L, 5L, 11L, 23L, 42L)) {
      val q = emb.filter(col("vec_id") === qid)
        .select(Similarity.asDouble(col("embedding"))).head().getSeq[Double](0)
      val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      for (nProbe <- Seq(2, 4, 8)) {
        val approx = Similarity.ivfTopK(cent, assigned, q, nProbe, 10)
          .collect().map(_.getLong(0)).toSet
        println(s"ivf qid=$qid nProbe=$nProbe recall@10=${(exact & approx).size / 10.0}")
      }
    }

    // SRP-LSH pair recall vs exact cosine pairs at several cutoffs
    val exactPairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", minCosine = 0.4)
      .select(col("id_a"), col("id_b"), col("score")).cache()
    for ((k, l) <- Seq((8, 1), (4, 8), (3, 10), (4, 16))) {
      val lsh = Similarity.lshBandedNeighbors(emb, "vec_id", "embedding", dim,
        planesPerTable = k, numTables = l)
        .select(col("id_a"), col("id_b")).distinct().cache()
      val nPairs = lsh.count()
      for (cut <- Seq(0.4, 0.45)) {
        val truth = exactPairs.filter(col("score") >= cut)
        val n = truth.count()
        val hit = truth.join(lsh, Seq("id_a", "id_b"), "left_semi").count()
        println(f"lsh k=$k L=$l cands=$nPairs cut=$cut truth=$n hit=$hit recall=${if (n == 0) 1.0 else hit.toDouble / n}%.3f")
      }
      lsh.unpersist()
    }
    spark.stop()
  }
}
