package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: r15 plan audit of the round's new queries (the r14 lesson:
  * explain-audit EVERY new query before closing — two double-computes
  * shipped in r14 first drafts and were caught exactly this way).
  */
object ProbeR15Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("q226_curation_gate", "q228_stream_asof",
        "q230_feed_reconcile", "q231_feed_gaps")) {
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    // q227/q229 are eager verdict queries (tx-lifecycle / MemoryStream):
    // building the frame runs the pipeline; their plan story is the
    // piece walls in BENCH_NOTES, not a single explain
    spark.stop()
  }
}
