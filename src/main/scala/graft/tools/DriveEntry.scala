package graft.tools

import org.apache.spark.sql.SparkSession

/** Simulates the driver's smoke check: a VANILLA session (none of our
  * configs except what the driver is known to set) calling
  * SparkEntry.entry and checking rows > 0.
  */
object DriveEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"DRIVE entry rows: $n (driver requires > 0)")
    df.show(3, false)
    // typed boundary check while we're here
    import org.apache.spark.sql.functions._
    val barJson = """{"Datetime":"2024-11-15T14:30:00.000Z","Open":1.0,"High":2.0,"Low":0.5,"Close":1.5,"Adj Close":1.5,"Volume":7,"Dividends":0.0,"Stock Splits":0.0,"ticker":"AAPL"}"""
    import spark.implicits._
    val bars = graft.ingest.Ingest.barsTyped(
      graft.ingest.Ingest.normalizeBars(Seq(barJson).toDF("value")))
    println("DRIVE typed Dataset[Bar]: " + bars.map(b => s"${b.ticker}@${b.close}").collect().mkString)
    spark.stop()
  }
}
