package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: plan audit — prints the formatted physical plan of selected
  * SparkEntry queries to eyeball pushdown / broadcast / shuffle shape.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_pricing_summary", "q02_filter_project", "q03_join_revenue",
      "q04_dim_broadcast_join", "q16_sort_limit", "q24_knn_cosine")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
