package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: r14 plan audit of the round's new queries. */
object ProbeR14Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("q219_span_cut", "q220_cut_curation", "q224_adjusted_close",
        "q221_dlq_replay", "q222_matryoshka_structured")) {
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
