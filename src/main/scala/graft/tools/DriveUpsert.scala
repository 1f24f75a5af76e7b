package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Pipelines

/** Dev drive: the exactly-once upsert sink, live. */
object DriveUpsert {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def bar(t: String, dt: String, vol: Int) =
      s"""{"Datetime":"$dt","Open":1.0,"High":2.0,"Low":0.5,"Close":1.5,"Adj Close":1.5,"Volume":$vol,"Dividends":0.0,"Stock Splits":0.0,"ticker":"$t"}"""
    val dir = java.nio.file.Files.createTempDirectory("drive_upsert_").toString
    val mem = MemoryStream[String]
    def run(rows: String*): Unit = {
      mem.addData(rows: _*)
      val q = Pipelines.start(
        Pipelines.upsertParquetSink(Pipelines.barsFromJson(mem.toDF()), s"$dir/tbl", s"$dir/ckpt", buckets = 8),
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(60000); q.stop()
      spark.catalog.refreshByPath(s"$dir/tbl")
    }
    run(bar("AAPL", "2024-11-15T14:30:00.000Z", 100), bar("MSFT", "2024-11-15T14:30:00.000Z", 10))
    println("DRIVE after insert batch:")
    spark.read.parquet(s"$dir/tbl").select("ticker", "volume").orderBy("ticker").show(false)
    run(bar("AAPL", "2024-11-15T14:30:00.000Z", 999)) // same id, new volume
    println("DRIVE after update batch (AAPL volume must be 999, still 2 rows):")
    spark.read.parquet(s"$dir/tbl").select("ticker", "volume").orderBy("ticker").show(false)
    run(bar("AAPL", "2024-11-15T14:30:00.000Z", 999)) // exact retry
    println("DRIVE after retry batch (unchanged):")
    spark.read.parquet(s"$dir/tbl").select("ticker", "volume").orderBy("ticker").show(false)
    spark.stop()
  }
}
