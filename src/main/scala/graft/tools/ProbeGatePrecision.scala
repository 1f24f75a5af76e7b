package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{Pipelines, StatefulOps}

/** Measures the curation gate's PRECISION SIZING rule (stream_soak
  * `near_dup_gate` found 61% of docs dropped at 6 × 2²⁰-bucket bands
  * under a 1M-doc/10-min horizon — band collisions, not real dups):
  * the same doc stream with every 37th doc an exact replay (the only
  * TRUE near-dups, ~2.7%) gated at numBlocks = 6 (20-bit bands,
  * Hamming ≤ 5 recall guarantee) vs numBlocks = 4 (30-bit bands,
  * 2¹⁰× more buckets, Hamming ≤ 3 guarantee). If the scaladoc's rule
  * is right, the dropped share collapses toward the replay rate at 4
  * blocks. Args: [durationSec] [docsPerBatch]
  */
object ProbeGatePrecision {
  def main(args: Array[String]): Unit = {
    val durationSec = args.headOption.map(_.toInt).getOrElse(40)
    val docsPerBatch = args.lift(1).map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Pipelines.configureStateStore(spark)
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val t0 = java.time.Instant.parse("2024-11-15T09:00:00Z").toEpochMilli
    def docs() = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", docsPerBatch.toLong)
      .option("numPartitions", 32)
      .load()
      .selectExpr("value AS doc_id",
        s"timestamp_millis(${t0}L + CAST(value * 120000 / $docsPerBatch AS BIGINT)) AS ts",
        """concat_ws(' ', transform(sequence(0, 11),
           i -> concat('w', ((value - CASE WHEN value % 37 = 36 THEN 1 ELSE 0 END) * 31 + i * 77773) % 999983))) AS text""")
    for (blocks <- Seq(6, 4)) {
      val out = java.nio.file.Files.createTempDirectory(s"gate_prec_$blocks").toString
      val occ = Pipelines.gateOccurrences(
          docs(), "doc_id", "ts", "text",
          graft.llmops.TextAnalysis.tokens(col("text")), numBlocks = blocks)
        .withWatermark("datetime", "10 minutes")
      val verdicts = StatefulOps.bandVerdicts(occ, horizonMs = 600000L)
      val q = Pipelines.start(Pipelines.nearDupGateSink(
          verdicts, blocks, s"$out/kept", s"$out/dropped", s"$out/ckpt"),
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("0 seconds"))
      try {
        Thread.sleep(durationSec * 1000L)
        q.stop(); q.awaitTermination(60000)
        q.exception.foreach(e => throw e)
      } finally if (q.isActive) q.stop()
      def n(p: String) =
        graft.sources.TxParquetTable.rowCount(p).getOrElse(0L)
      val kept = n(s"$out/kept"); val dropped = n(s"$out/dropped")
      val share = dropped.toDouble / math.max(kept + dropped, 1L)
      println(f"[gate_precision] blocks=$blocks bandBits=${120 / blocks} " +
        f"kept=$kept dropped=$dropped dropped_share=$share%.4f " +
        f"(true replay rate 1/37 = ${1.0 / 37}%.4f)")
    }
    spark.stop()
  }
}
