package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage timing of q236 at sf0.1 — attribution for BENCH_NOTES. */
object ProbeBulkCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.llmops.{AnnIndex, Similarity}
    val dir = "/root/testdata/sf0.1"
    val emb = graft.Tables.load(spark, dir, "embeddings")
    emb.cache(); emb.count()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[bulkcost] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val path = java.nio.file.Files.createTempDirectory("bulk_cost").toString
    val (centroids, assigned) = t("ivf_lloyd") {
      val r = Similarity.ivfIndex(emb, "vec_id", "embedding", 64, 16, 1)
      r._2.count(); r
    }
    t("append_centroids") {
      graft.sources.TxParquetTable.append(centroids, s"$path/centroids")
    }
    t("append_assignments") {
      graft.sources.TxParquetTable.append(
        assigned.select(col("id"), col("v"), col("cell")),
        s"$path/assignments", statsColumns = Seq("cell"))
    }
    t("compact_clustered") {
      graft.sources.TxParquetTable.compact(spark, s"$path/assignments", "id",
        targetFiles = 8, clusterBy = Some("cell"))
    }
    t("rowcount") {
      graft.sources.TxParquetTable.rowCount(s"$path/assignments")
    }
    val path2 = java.nio.file.Files.createTempDirectory("bulk_cost2").toString
    t("fit+compact_2nd") {
      AnnIndex.fitIvfIndex(emb, "vec_id", "embedding", 64, nCells = 16, path2)
    }
    val reps = spark.range(25).select(col("id").as("rep"))
    val queries = emb.filter(col("vec_id") < 500).crossJoin(broadcast(reps))
      .select((col("vec_id") * 32 + col("rep")).as("qid"),
        Similarity.asDouble(col("embedding")).as("qv"))
    val served = t("bulk_serve+checkpoint") {
      AnnIndex.queryIvfIndexBulk(spark, path, queries, "qid", "qv", 4, 10)
        .select(col("qid"), floor(col("qid") / 32).as("base"), col("id"))
        .localCheckpoint(true)
    }
    val baseQueries = emb.filter(col("vec_id") < 500)
      .select(col("vec_id").as("qid"), Similarity.asDouble(col("embedding")).as("qv"))
    val exact = t("exact_twin") {
      val e = Similarity.cosineTopKBatch(emb, "vec_id", "embedding",
        baseQueries, "qid", "qv", k = 10).select(col("qid").as("base"), col("id"))
      e.count(); e
    }
    t("accounting") {
      served.count(); served.select("qid").distinct().count()
      served.join(exact, Seq("base", "id"), "left_semi").count()
      served.select("base", "id").distinct().count()
    }
    spark.stop()
  }
}
