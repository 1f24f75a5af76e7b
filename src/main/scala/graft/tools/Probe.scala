package graft.tools

import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/tmp/graft_sf20"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def joins(name: String): Unit = {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      val smj = plan.linesIterator.count(_.contains("SortMergeJoin"))
      val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
      val bnl = plan.linesIterator.count(_.contains("BroadcastNestedLoop"))
      println(s"[probe] $name smj=$smj bhj=$bhj bnl=$bnl")
    }
    println("[probe] == no cache ==")
    joins("q100_curation_extended"); joins("q121_curation_v2")
    println("[probe] == cached ==")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("orders", "lineitem", "events", "documents", "embeddings").foreach { t =>
      try { val df = spark.read.parquet(s"$dir/$t.parquet"); df.cache(); df.count() }
      catch { case _: Throwable => () }
    }
    joins("q100_curation_extended"); joins("q121_curation_v2")
    spark.stop()
  }
}
