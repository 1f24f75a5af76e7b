package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llmops.{Components, Dedup}

/** r10 probe: q72's CC stage — min-propagation vs alternating variant
  * on the real sf0.1 (and optional sf1) candidate graph, 3 in-JVM
  * iterations each. Same canonical min-label fixpoint, so whichever is
  * faster can serve q72 without touching its oracle.
  */
object ProbeCC2 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.isEmpty) Seq("/root/testdata/sf0.1") else args.toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val docs = graft.Tables.load(spark, dir, "documents")
      docs.cache(); docs.count()
      val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
        .localCheckpoint()
      println(s"[cc2] $dir pairs=${pairs.count()}")
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val a = Components.connectedComponents(pairs, "doc_a", "doc_b").count()
        val t1 = System.nanoTime()
        val b = Components.connectedComponentsAlternating(pairs, "doc_a", "doc_b").count()
        val t2 = System.nanoTime()
        println(f"[cc2] $dir iter=$i minprop=${(t1 - t0) / 1e9}%.3f ($a rows) " +
          f"alternating=${(t2 - t1) / 1e9}%.3f ($b rows)")
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
