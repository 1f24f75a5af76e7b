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

    // ---- r17: the PQ-compressed serve economics (q243) ----
    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      if (!d.exists) 0L
      else d.listFiles.filter(_.isFile).map(_.length).sum
    }
    val path3 = java.nio.file.Files.createTempDirectory("bulk_cost_pq").toString
    t("pq_fit(m=8,ksub=16)+encode") {
      AnnIndex.fitIvfPqIndex(emb, "vec_id", "embedding", 64, nCells = 16,
        m = 8, ksub = 16, path3)
    }
    val rawBytes = dirBytes(s"$path3/assignments/data")
    val codeBytes = dirBytes(s"$path3/codes/data")
    println(f"[bulkcost] serve-scan bytes: raw assignments $rawBytes%,d vs " +
      f"PQ codes $codeBytes%,d (${rawBytes.toDouble / codeBytes}%.1fx smaller candidate scan)")
    t("pq_bulk_serve(shortlist=200)") {
      AnnIndex.queryIvfPqIndexBulk(spark, path3, queries, "qid", "qv",
        nProbe = 4, k = 10, shortlist = 200).count()
    }
    t("raw_bulk_serve(same index)") {
      AnnIndex.queryIvfIndexBulk(spark, path3, queries, "qid", "qv",
        nProbe = 4, k = 10).count()
    }
    spark.stop()
  }
}
