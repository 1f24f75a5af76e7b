package graft.tools

import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q155_curation_capstone")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = plan.linesIterator.filter(_.contains("Exchange ")).toSeq
    println(s"[probe] exchanges=${exchanges.size}")
    exchanges.foreach(l => println("[probe-ex] " + l.trim.take(150)))
    println(s"[probe] aqe_broadcasts=${plan.linesIterator.count(_.contains("BroadcastHashJoin"))}")
    println(s"[probe] smj=${plan.linesIterator.count(_.contains("SortMergeJoin"))}")
    spark.stop()
  }
}
