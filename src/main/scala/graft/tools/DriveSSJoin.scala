package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Pipelines

/** Dev drive: live stream-stream interval join (trades x bars). */
object DriveSSJoin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def bar(t: String, dt: String, vol: Int) =
      s"""{"Datetime":"$dt","Open":1.0,"High":2.0,"Low":0.5,"Close":1.5,"Adj Close":1.5,"Volume":$vol,"Dividends":0.0,"Stock Splits":0.0,"ticker":"$t"}"""
    def trade(sym: String, tMillis: Long, p: Double) =
      s"""{"c":[],"p":$p,"s":"$sym","t":$tMillis,"v":5}"""
    val barsMem = MemoryStream[String]
    val tradesMem = MemoryStream[String]
    val bars = Pipelines.barsFromJson(barsMem.toDF(), "2 minutes")
      .select(col("ticker"), col("datetime"), col("close"))
    val trades = Pipelines.tradesFromJson(tradesMem.toDF(), "2 minutes")
      .select(col("symbol").as("ticker"), col("datetime").as("trade_time"), col("last_price"))
    val q = Pipelines.streamIntervalJoin(trades, bars, "ticker", "trade_time", "datetime", 300L)
      .writeStream.format("memory").queryName("drive_ss").outputMode("append").start()
    val base = 1731681000000L
    barsMem.addData(bar("AAPL", "2024-11-15T14:30:00.000Z", 100))
    tradesMem.addData(
      trade("AAPL", base + 60000, 101.5),  // in window
      trade("AAPL", base + 600000, 99.0),  // outside 5-min window
      trade("ZZZZ", base + 60000, 1.0))    // no matching bar
    q.processAllAvailable()
    println("DRIVE ss-join results:")
    spark.table("drive_ss").selectExpr("ticker", "trade_time", "last_price", "right_row.close AS bar_close").show(false)
    // probe: second bar arrives later, new trade joins against it
    barsMem.addData(bar("AAPL", "2024-11-15T14:40:00.000Z", 50))
    tradesMem.addData(trade("AAPL", base + 630000, 102.0)) // 14:40:30 -> joins 14:40 bar
    q.processAllAvailable()
    println("DRIVE after late bar + new trade: " + spark.table("drive_ss").count() + " rows")
    spark.table("drive_ss").orderBy("trade_time").show(false)
    q.stop(); spark.stop()
  }
}
