package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llmops.{Dedup, Similarity}

/** One-off probe for the r7 oracle-companion thresholds: print the RAW
  * approximation errors / recalls of q28/q41/q43/q58/q66's approximate
  * operators at a given SF, so the companion verdicts' tolerances are
  * picked with measured margin rather than guessed.
  */
object ProbeCompanions {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    println("== q28: HLL++ (rsd 0.02, the committed sketch) vs exact distinct ==")
    events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("a"),
        countDistinct(col("user_id")).as("e"))
      .select(col("event_type"), col("a"), col("e"),
        (abs(col("a") - col("e")) / col("e")).as("rel_err"))
      .show(20, false)

    println("== q58: approx_percentile vs exact ==")
    events.groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, 0.5, 1000)").as("a50"),
        expr("percentile(value, 0.5)").as("e50"),
        expr("approx_percentile(value, 0.99, 1000)").as("a99"),
        expr("percentile(value, 0.99)").as("e99"))
      .select(col("event_type"),
        (abs(col("a50") - col("e50")) / abs(col("e50"))).as("rel50"),
        (abs(col("a99") - col("e99")) / abs(col("e99"))).as("rel99"),
        col("e50"), col("e99"))
      .show(20, false)

    println("== q41: LSH banded recall of exact pairs (threshold 0.4) ==")
    val exactPairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", minCosine = 0.4)
      .select(col("id_a"), col("id_b"))
    val lsh = Similarity.lshBandedNeighbors(emb, "vec_id", "embedding",
      dim = 64, planesPerTable = 4, numTables = 8, minScore = 0.4)
      .select(col("id_a"), col("id_b"))
    val nExact = exactPairs.count()
    val nHit = exactPairs.join(lsh, Seq("id_a", "id_b"), "left_semi").count()
    val nLsh = lsh.count()
    println(s"exact=$nExact lsh=$nLsh hits=$nHit recall=${nHit.toDouble / nExact} " +
      s"precision=${nHit.toDouble / nLsh}")

    println("== q43: IVF top-10 recall vs exact top-10 (vec 0, nProbe 6/16) ==")
    val qv = emb.filter(col("vec_id") === 0)
      .select(Similarity.asDouble(col("embedding")).as("qv"))
      .collect()(0).getSeq[Double](0)
    val (cent, assigned) = Similarity.ivfIndex(emb, "vec_id", "embedding", 64, 16)
    val ivf = Similarity.ivfTopK(cent, assigned.filter(col("id") =!= 0), qv, nProbe = 6, k = 10)
      .select(col("id"))
    val exactTop = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(emb.filter(col("vec_id") === 0)
        .select(Similarity.asDouble(col("embedding")).as("qq"))))
      .select(col("vec_id").as("id"),
        (Similarity.dot(Similarity.asDouble(col("embedding")), col("qq")) /
          (Similarity.norm(Similarity.asDouble(col("embedding"))) * Similarity.norm(col("qq")))).as("s"))
      .orderBy(col("s").desc, col("id")).limit(10).select(col("id"))
    val hits43 = exactTop.join(ivf, Seq("id"), "left_semi").count()
    println(s"q43 hits=$hits43 / 10")

    println("== q66: IVF batch recall per query (vec 0-4, nProbe 4/16) ==")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), Similarity.asDouble(col("embedding")).as("qv"))
    val ivfB = Similarity.ivfTopKBatch(cent, assigned, queries, "qid", "qv",
      nProbe = 4, k = 10, excludeSelfId = true).select(col("qid"), col("id"))
    val exactB = Similarity.cosineTopKBatch(emb, "vec_id", "embedding",
      queries, "qid", "qv", k = 10, excludeSelfId = true).select(col("qid"), col("id"))
    exactB.join(ivfB, Seq("qid", "id"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
      .orderBy(col("qid")).show(10, false)

    spark.stop()
  }
}
