package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.Dedup

/** Dev tool: stage-by-stage timing of the q37 jaccard-verify pipeline. */
object ProbeDedup {
  def time(label: String)(f: => Long): Unit = {
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }
    println(f"STAGE $label: ${runs.map(r => f"${r._1}%.2f").mkString(", ")} (rows=${runs.head._2})")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(100000).selectExpr("sum(id)").collect()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("scan")(docs.count())

    time("candidates (q22)")(
      Dedup.minhashCandidatePairs(docs, "doc_id", "text").count())

    val sh = graft.util.Partitioning.ensureParallelism(docs)
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"), explode(array_distinct(Dedup.shingles(col("text"), 8))).as("shingle"))
    time("shingle explode")(sh.count())

    time("sizes agg")(sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh")).count())

    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
    val inter = pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_shared_bands"))
      .agg(count(lit(1)).as("inter"))
    time("inter join")(inter.count())

    time("full q37")(Dedup.jaccardVerifiedPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
