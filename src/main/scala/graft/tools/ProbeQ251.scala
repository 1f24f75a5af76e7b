package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r18: reproduce q251's ingest half stage by stage to find the two
  * multi-second single-task AQE jobs ProbeJobs surfaced.
  */
object ProbeQ251 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val o0 = spark.read.parquet(s"$sfDir/orders.parquet")
    o0.cache(); o0.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val o = graft.util.Partitioning.ensureParallelism(o0)
    val k = col("o_orderkey")
    val bar = to_json(struct(
      col("o_orderdate").cast("timestamp").as("Datetime"),
      col("o_totalprice").as("Open"),
      (col("o_totalprice") * 1.01).as("High"),
      (col("o_totalprice") * 0.99).as("Low"),
      col("o_totalprice").as("Close"),
      col("o_totalprice").as("Adj Close"),
      (pmod(k, lit(50)) + 1).cast("int").as("Volume"),
      lit(0.0).as("Dividends"),
      lit(0.0).as("Stock Splits"),
      concat(lit("T"), k).as("ticker")))
    def withExtra(key: String, v: String) =
      concat(substring(bar, lit(1), length(bar) - 1),
        lit(s""","$key":"$v"}"""))
    val wire = o.select(
      when(pmod(k, lit(9)) === 0, withExtra("Source", "api"))
        .when(pmod(k, lit(11)) === 0, withExtra("Origin", "ws"))
        .otherwise(bar).as("value"))
    val declared = Seq("Datetime", "Open", "High", "Low", "Close",
      "Adj Close", "Volume", "Dividends", "Stock Splits", "ticker")
    val gated = graft.ingest.Ingest.shapeGate(wire, declared)
    time("wire noop")(wire.write.format("noop").mode("overwrite").save())
    time("gated noop")(gated.write.format("noop").mode("overwrite").save())
    val quarFrame = gated.filter(col("shape_lane") =!= "shape_ok")
      .select(col("value").as("raw"), col("shape_lane"))
    println("== quarFrame plan ==")
    quarFrame.explain("formatted")
    time("quar noop")(quarFrame.write.format("noop").mode("overwrite").save())
    val routed = graft.ingest.Ingest.barsWithDeadLetter(
      gated.filter(col("shape_lane") === "shape_ok").select("value"))
    val goodFrame = routed.filter(col("dead_reason").isNull).drop("raw", "dead_reason")
    time("good noop")(goodFrame.write.format("noop").mode("overwrite").save())
    time("good noop2")(goodFrame.write.format("noop").mode("overwrite").save())
    val tmp = java.nio.file.Files.createTempDirectory("probe_q251").toString
    time("quar append")(graft.sources.TxParquetTable.append(quarFrame, s"$tmp/quar"))
    time("good append")(graft.sources.TxParquetTable.append(goodFrame, s"$tmp/tgt"))
    println("== goodFrame plan ==")
    goodFrame.explain("formatted")
    spark.stop()
  }
}
