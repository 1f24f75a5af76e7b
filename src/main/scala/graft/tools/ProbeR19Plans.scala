package graft.tools

import java.io.PrintWriter

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llmops.{AnnIndex, Similarity}

/** r19 plan evidence: the ANN bulk-serve queries are EAGER (they collect
  * verdict constants and return a literal frame), so their committed
  * plan story is the SERVE SUBPLAN, reconstructed here exactly as
  * q236/q243 build it — fit a tiny index, then explain (a) the bulk
  * serve output and (b) the fused accounting aggregate over it. Run
  * with the suffix arg "before" on the pre-change tree and "after" on
  * the post-change tree; files land in plans/r19/.
  */
object ProbeR19Plans {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("after")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val emb = graft.Tables.load(spark, dir, "embeddings")
    def dump(name: String, text: String): Unit = {
      val w = new PrintWriter(s"plans/r19/${name}_$suffix.txt")
      try w.write(text) finally w.close()
    }
    val path = java.nio.file.Files.createTempDirectory("r19plans")
    try {
      AnnIndex.fitIvfIndex(emb, "vec_id", "embedding", 64, nCells = 16,
        s"$path/idx")
      val reps = spark.range(25).select(col("id").as("rep"))
      val queries = emb.filter(col("vec_id") < 500).crossJoin(broadcast(reps))
        .select((col("vec_id") * 32 + col("rep")).as("qid"),
          Similarity.asDouble(col("embedding")).as("qv"))
      locally {
        import graft.sources.TxParquetTable
        val cents = TxParquetTable.snapshot(spark, s"$path/idx/centroids")
          .select(col("cell"), col("centroid")).collect()
          .map(r => (r.getInt(0), r.getSeq[Double](1)))
          .sortBy(_._1)
        val tagged = AnnIndex.tagProbeCells(queries, "qid", "qv",
          cents.map(_._1).toSeq, cents.map(_._2.toSeq).toSeq, nProbe = 4)
        dump("ann_probe_tagging",
          "tagProbeCells — the probe-tagged query frame every bulk serve " +
            "checkpoints (r19: the query frame is spread to the session " +
            "parallelism BEFORE the per-row probe/norm tagging; before " +
            "r19 the whole tagging ran on the source frame's few scan " +
            "splits):\n" +
            tagged.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
      }
      val served = AnnIndex.queryIvfIndexBulk(spark, s"$path/idx", queries,
          "qid", "qv", nProbe = 4, k = 10)
        .select(col("qid"), floor(col("qid") / 32).as("base"), col("id"))
      dump("q236_bulk_serve_subplan",
        "queryIvfIndexBulk output (the q236/q243 serve subplan; the probe-" +
          "tagged query frame materializes into the checkpointed RDD this " +
          "plan scans):\n" +
          served.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      val baseQueries = emb.filter(col("vec_id") < 500)
        .select(col("vec_id").as("qid"),
          Similarity.asDouble(col("embedding")).as("qv"))
      val exact = Similarity.cosineTopKBatch(emb, "vec_id", "embedding",
          baseQueries, "qid", "qv", k = 10)
        .select(col("qid").as("base"), col("id"))
      if (suffix == "before") {
        // the pre-r19 accounting: four separate actions over the pinned
        // serve output — dump each action's plan
        val pinned = served.localCheckpoint(true)
        val fm = org.apache.spark.sql.execution.FormattedMode
        dump("q236_accounting",
          "q236/q243 accounting BEFORE r19: four actions over a " +
            "localCheckpoint(true) pin of the serve output —\n\n" +
            "1) n_served = served.count():\n" +
            pinned.groupBy().count().queryExecution.explainString(fm) +
            "\n2) n_queries = served.select(qid).distinct().count():\n" +
            pinned.select(col("qid")).distinct().groupBy().count()
              .queryExecution.explainString(fm) +
            "\n3) n_hit = served semi-join exact, count():\n" +
            pinned.join(exact, Seq("base", "id"), "left_semi").groupBy().count()
              .queryExecution.explainString(fm) +
            "\n4) n_base_pairs = served.select(base, id).distinct().count():\n" +
            pinned.select(col("base"), col("id")).distinct().groupBy().count()
              .queryExecution.explainString(fm))
      } else {
        val acct = served
          .join(exact.withColumn("__hit", lit(true)), Seq("base", "id"), "left")
          .agg(count(lit(1)).as("n_served"),
            countDistinct(col("qid")).as("n_queries"),
            count(col("__hit")).as("n_hit"),
            countDistinct(col("base"), col("id")).as("n_base_pairs"))
        dump("q236_accounting",
          "q236/q243 accounting (r19: ONE aggregate job; before r19 this was " +
            "4 separate actions — count / distinct-count / semi-join count / " +
            "pair distinct-count — over a localCheckpointed serve output):\n" +
            acct.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode))
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(path.toFile).deleteRecursively()
    }
    spark.stop()
  }
}
