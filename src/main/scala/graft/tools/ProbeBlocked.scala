package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** X74 evidence probe: the blocked pair screen vs the full cross at an
  * UNCAPPED key universe — sf0.1's 1000 suppliers (q208's oracle anchor
  * deliberately caps at 100 keys; this measures the regime the operator
  * exists for). Prints pair counts and wall time for the full
  * cointegration screen vs the SRP-blocked screen at several `bits`.
  */
object ProbeBlocked {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    val d = graft.Tables.load(spark, dir, "lineitem")
      .withColumn("month", date_format(col("l_shipdate"), "yyyy-MM"))
      .groupBy(col("l_suppkey"), col("month"))
      .agg(max(col("l_extendedprice")).as("close"))
      .localCheckpoint(true)
    val nKeys = d.select("l_suppkey").distinct().count()
    println(s"[blocked] keys=$nKeys full_pairs=${nKeys * (nKeys - 1) / 2}")
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      var rows = 0L
      val t = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        rows = mk.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[blocked] $label: rows=$rows%d min=$t%.2f s")
    }
    time("full cross") {
      graft.analytics.Pairs.cointegrationScreen(d, "l_suppkey", "month", "close")
    }
    Seq(3, 5, 6).foreach { bits =>
      val blocks = graft.analytics.Pairs
        .blockedPairSource(d, "l_suppkey", "month", "close", bits)
        .localCheckpoint(true)
      time(s"blocked bits=$bits") {
        graft.analytics.Pairs.cointegrationScreen(
          d, "l_suppkey", "month", "close", Some(blocks))
      }
    }
    spark.stop()
  }
}
