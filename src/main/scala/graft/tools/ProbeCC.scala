package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: compare the two connected-components variants on the
  * sf-dir's minhash pair graph (propagation vs alternating star).
  */
object ProbeCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = graft.llmops.Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      .persist()
    println(s"pairs: ${pairs.count()}")
    (1 to 3).foreach { i =>
      var t0 = System.nanoTime()
      val n1 = graft.llmops.Components.connectedComponents(pairs, "doc_a", "doc_b").count()
      println(f"prop#$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n1)")
      t0 = System.nanoTime()
      val n2 = graft.llmops.Components.connectedComponentsAlternating(pairs, "doc_a", "doc_b").count()
      println(f"star#$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n2)")
    }
    spark.stop()
  }
}
