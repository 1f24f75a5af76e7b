package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{Pipelines, StatefulOps}

/** Route probe behind the StreamSoak `pair_spread` segment (r12 judge
  * item 5 / DESIGN item 16). Two findings, both load-bearing:
  *
  *   1. `streamIntervalJoin` (keying on the pair alone, time range as
  *      a post-probe filter) NEVER FINISHES its first micro-batch at
  *      bar-dense timestamps — 20 keys × 5000 rows/key/batch ≈ 25M
  *      probe comparisons per key; the scaladoc caveat on
  *      [[Pipelines.streamIntervalJoin]] records this measurement.
  *   2. The equi-join on (pair, ts) — watermarked event time IN the
  *      join keys — runs ~20 batches/min at 200k rows/batch with join
  *      state PLATEAUED by watermark eviction, and Spark 4 executes
  *      the chained stateful pipeline (symmetricHashJoin →
  *      flatMapGroupsWithState) in one query: the deferred "two-key
  *      joint state" operator is NOT needed.
  */
object DrivePairJoin {
  def main(args: Array[String]): Unit = {
    val rowsPerBatch = 100000
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    Pipelines.configureStateStore(spark)
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val t0 = java.time.Instant.parse("2024-11-15T09:00:00Z").toEpochMilli
    def leg(side: String) = {
      val x = "100.0 + CAST(value % 89 AS DOUBLE) * 0.1"
      val price = side match {
        case "x" => x
        case "y" => s"2.0 * ($x) + 5.0 + CASE WHEN value % 997 = 0 THEN 40.0 ELSE 0.0 END"
      }
      spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rowsPerBatch.toLong)
        .option("numPartitions", 8)
        .load()
        .selectExpr(
          "concat('PR', lpad(CAST(value % 20 AS STRING), 2, '0')) AS pair",
          s"timestamp_millis(${t0}L + CAST(value * 120000 / $rowsPerBatch AS BIGINT)) AS ts",
          s"CAST($price AS DOUBLE) AS px")
    }
    val legY = leg("y").withWatermark("ts", "10 minutes")
      .select(col("pair"), col("ts"), col("px").as("py"))
    val legX = leg("x").withWatermark("ts", "10 minutes")
    // exact co-arrival: equi-join on (pair, ts) — the watermarked event
    // time in the join keys is what lets Spark evict join state
    val joined = legY.join(legX, Seq("pair", "ts"))
      .withColumn("spread", col("py") - (lit(5.0) + lit(2.0) * col("px")))
      .select("pair", "ts", "spread")
    val mon = StatefulOps.zScoreAnomalies(
      joined.select(col("pair").as("ticker"), col("ts").as("datetime"),
        col("spread").cast("float").as("price"), lit(1).as("volume"))
        .as[StatefulOps.TickerTick], threshold = 3.0, minPrior = 5)
    val dir = java.nio.file.Files.createTempDirectory("pairjoin_")
    val q = Pipelines.start(
      Pipelines.parquetSink(mon.toDF(), s"$dir/out", s"$dir/ckpt"),
      Trigger.ProcessingTime("0 seconds"))
    try {
      (1 to 12).foreach { i =>
        Thread.sleep(5000)
        println(s"[pairjoin] t=${i * 5}s status=${q.status.message} " +
          s"batches=${q.recentProgress.length}")
      }
      q.stop(); q.awaitTermination(30000)
      println(s"[pairjoin] exception=${q.exception.map(_.getMessage.take(600))}")
      q.recentProgress.foreach { p =>
        println(s"[pairjoin] batch=${p.batchId} in=${p.numInputRows} " +
          s"state=${p.stateOperators.map(s => s.operatorName + ":" + s.numRowsTotal).mkString(",")} " +
          s"sinkDesc=${p.sink.numOutputRows}")
      }
      val files = new java.io.File(s"$dir/out").listFiles()
      println(s"[pairjoin] outFiles=${Option(files).map(_.length)}")
    } finally if (q.isActive) q.stop()
    spark.stop()
  }
}
