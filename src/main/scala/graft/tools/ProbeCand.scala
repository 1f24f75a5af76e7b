package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.Dedup

/** Dev tool: sub-stage timing of minhashCandidatePairs. */
object ProbeCand {
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
    val sig = graft.util.Partitioning.ensureParallelism(docs)
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"),
        graft.functions.MinHashBands.minhashBands(col("text"), 8, 16, 4).as("bands"))
    time("minhash sig")(sig.select(sum(length(element_at(col("bands"), 1)))).count())
    val banded = sig.select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    time("banded")(banded.select(sum(length(col("band_hash")))).count())
    val a = banded.as("a"); val b = banded.as("b")
    val joined = a.join(b,
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
    time("self-join")(joined.count())
    time("full candidates")(Dedup.minhashCandidatePairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
