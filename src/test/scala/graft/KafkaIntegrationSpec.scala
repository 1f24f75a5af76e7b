package graft

import org.apache.spark.sql.functions._

import graft.streaming.Pipelines

/** S1/S2/T5 cluster smoke test, CONNECTOR-GATED (r9 verdict item 4).
  *
  * The harness image ships no `spark-sql-kafka` artifact anywhere on the
  * classpath (determination: `docs/DESIGN.md` "Kafka connector" — both
  * `/opt/spark/jars` and the coursier cache were checked), so in this
  * image every test here SKIPS (cancels) via `assume`, loudly, rather
  * than silently passing. On a jar-equipped cluster
  * (`--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`) the
  * plan-level test runs as the smoke test the determination promised;
  * the live end-to-end additionally needs `GRAFT_KAFKA_BROKERS` +
  * `GRAFT_KAFKA_TOPIC` pointing at a real broker (streaming sources
  * only contact the broker at `start()`, so plan assertions need no
  * broker at all).
  */
class KafkaIntegrationSpec extends SparkSpec {

  private val connectorPresent =
    try { Pipelines.requireKafkaConnector(); true }
    catch { case _: IllegalStateException => false }

  test("connector absent in this image fails fast at BUILD time with artifact coordinates") {
    assume(!connectorPresent, "connector present — covered by the gated tests below")
    val e = intercept[IllegalStateException] {
      Pipelines.kafkaSource(spark, "broker:9092", "prices")
    }
    assert(e.getMessage.contains("spark-sql-kafka-0-10_2.13"))
  }

  test("[connector-gated] kafkaSource plan: Kafka frame resolves, value path feeds the bars wire") {
    assume(connectorPresent, "spark-sql-kafka connector absent (zero-egress image) — " +
      "run on a jar-equipped cluster (docs/DESIGN.md records the determination)")
    // no broker needed: streaming sources defer connection to start()
    val src = Pipelines.kafkaSource(spark, "broker:9092", "prices",
      startingOffsets = "latest", maxOffsetsPerTrigger = Some(10000L))
    assert(src.isStreaming)
    // the fixed Kafka frame the whole ingest surface binds to
    for (c <- Seq("key", "value", "topic", "partition", "offset", "timestamp"))
      assert(src.columns.contains(c), s"missing Kafka frame column: $c")
    // the same post-`value` wire MemoryStream tests execute composes on top
    val bars = Pipelines.barsFromJson(
      src.selectExpr("CAST(value AS STRING) AS value"))
    assert(bars.isStreaming && bars.columns.contains("datetime"))
    // the sink writer builds against the same frame
    Pipelines.kafkaSink(bars.select(to_json(struct(bars.columns.map(col): _*))
      .as("value")), "broker:9092", "prices_out",
      java.nio.file.Files.createTempDirectory("kafka_ck_").toString)
  }

  test("[connector+broker-gated] live kafkaSource -> runPipeline -> sink table round trip") {
    assume(connectorPresent, "spark-sql-kafka connector absent (zero-egress image)")
    val brokers = sys.env.get("GRAFT_KAFKA_BROKERS")
    val topic = sys.env.get("GRAFT_KAFKA_TOPIC")
    assume(brokers.nonEmpty && topic.nonEmpty,
      "set GRAFT_KAFKA_BROKERS + GRAFT_KAFKA_TOPIC to run the live smoke")
    val sink = java.nio.file.Files.createTempDirectory("kafka_sink_").toString
    val ck = java.nio.file.Files.createTempDirectory("kafka_live_ck_").toString
    val q = Pipelines.runBarsPipeline(spark, brokers.get, topic.get,
      sink, ck)
    try {
      q.processAllAvailable()
      // whatever the topic held must have landed exactly-once keyed by id
      val out = spark.read.parquet(sink)
      assert(out.count() === out.select("id").distinct().count())
    } finally q.stop()
  }
}
