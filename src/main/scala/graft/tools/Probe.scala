package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.Dedup

/** Dev scratch profiler (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](n: String)(f: => T): Unit = {
      val t0 = System.nanoTime; f
      println(f"PROBE $n: ${(System.nanoTime - t0) / 1e9}%.1f sec")
    }
    val sh = docs.filter(length(col("text")) >= 8)
      .withColumn("__h", Dedup.shingleBaseHashes(Dedup.shingles(col("text"), 8)))
    time("base_hashes") { sh.select(sum(size(col("__h")))).collect() }
    val sig = sh.select(col("doc_id"), Dedup.minhashSignature(col("__h"), 16).as("sig"))
    time("signature") { sig.select(count(lit(1))).collect() }
    val banded = sh.select(col("doc_id"),
        Dedup.lshBands(Dedup.minhashSignature(col("__h"), 16), 4, 4).as("bands"))
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    time("banded") { banded.count() }
    time("full") { Dedup.minhashCandidatePairs(docs, "doc_id", "text").count() }
    sig.explain("formatted")
    spark.stop()
  }
}
