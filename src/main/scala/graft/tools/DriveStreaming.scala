package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Pipelines

/** Dev drive: run the streaming pipelines live and print sink contents. */
object DriveStreaming {
  def bar(t: String, dt: String, vol: Int): String =
    s"""{"Datetime":"$dt","Open":1.0,"High":2.0,"Low":0.5,"Close":1.5,"Adj Close":1.5,"Volume":$vol,"Dividends":0.0,"Stock Splits":0.0,"ticker":"$t"}"""

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Pipelines.configureStateStore(spark)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val mem = MemoryStream[String]
    val candles = Pipelines.streamingCandles(
      Pipelines.dedupWithinWatermark(Pipelines.barsFromJson(mem.toDF(), "2 minutes"))
        .withColumn("seq", col("datetime").cast("long")),
      "datetime", "ticker", "close", "volume", "seq", "5 minutes")
    val q = candles.writeStream.format("memory").queryName("live_candles")
      .outputMode("append").start()

    // batch 1: two bars in one window + a duplicate (dedup) + malformed + gated
    mem.addData(
      bar("AAPL", "2024-11-15T14:30:00.000Z", 100),
      bar("AAPL", "2024-11-15T14:30:00.000Z", 100), // exact dup
      bar("AAPL", "2024-11-15T14:31:00.000Z", 200),
      bar("MSFT", "2024-11-15T14:30:00.000Z", 0),   // gated: vol 0
      "{malformed}")
    q.processAllAvailable()
    println("DRIVE after batch1 (window still open): " + spark.table("live_candles").count() + " rows")

    // batch 2: advance event time past watermark -> window closes
    mem.addData(bar("AAPL", "2024-11-15T15:00:00.000Z", 10))
    q.processAllAvailable()
    mem.addData(bar("AAPL", "2024-11-15T15:30:00.000Z", 10))
    q.processAllAvailable()
    spark.table("live_candles").orderBy("bucket_start").show(false)

    // probe: LATE bar for the already-closed 14:30 window -> must be dropped
    mem.addData(bar("AAPL", "2024-11-15T14:32:00.000Z", 999))
    q.processAllAvailable()
    val n = spark.table("live_candles").filter(col("volume") === 999).count()
    println(s"DRIVE late-data rows admitted: $n (expect 0)")
    val closed = spark.table("live_candles").filter(col("n") === 2).collect()
    println("DRIVE closed window: " + closed.mkString("; "))
    q.stop()

    // update-mode drive: only changed groups re-emit
    val umem = MemoryStream[String]
    val uq = Pipelines.runningTotalsUpdateMode(Pipelines.barsFromJson(umem.toDF()))
      .writeStream.format("memory").queryName("drive_upd").outputMode("update").start()
    umem.addData(bar("AAPL", "2024-11-15T14:30:00.000Z", 100), bar("MSFT", "2024-11-15T14:30:00.000Z", 10))
    uq.processAllAvailable()
    umem.addData(bar("AAPL", "2024-11-15T14:31:00.000Z", 50))
    uq.processAllAvailable()
    println("DRIVE update-mode emissions (expect 3: AAPL, MSFT, then AAPL only):")
    spark.table("drive_upd").show(false)
    uq.stop()

    // stateful drive: running OHLC via flatMapGroupsWithState across batches
    import graft.streaming.StatefulOps
    import graft.streaming.StatefulOps.TickerTick
    val tmem = MemoryStream[TickerTick]
    val oq = StatefulOps.runningOhlc(tmem.toDS())
      .writeStream.format("memory").queryName("live_ohlc").outputMode("append").start()
    tmem.addData(TickerTick("AAPL", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 10f, 100))
    oq.processAllAvailable()
    tmem.addData(TickerTick("AAPL", java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 20f, 10))
    oq.processAllAvailable()
    println("DRIVE running OHLC snapshots:")
    spark.table("live_ohlc").show(false)
    oq.stop()

    // multimodal drive
    val feats = graft.llmops.Multimodal.extractFeatures(
      graft.llmops.Multimodal.bucketByContent(graft.llmops.Multimodal.syntheticMedia(spark, 6), 2), 4)
    feats.show(3, false)
    println("DRIVE resized images (maxDim 32):")
    graft.llmops.Multimodal.resizeImages(graft.llmops.Multimodal.syntheticMedia(spark, 6), 32)
      .filter(_.kind == "image").toDF().select("media_id", "kind", "width", "height").show(false)
    spark.stop()
  }
}
