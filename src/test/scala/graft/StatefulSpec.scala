package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{OhlcSnapshot, TickerTick}

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  private def tick(t: String, ts: String, p: Float, v: Int) =
    TickerTick(t, Timestamp.valueOf(ts), p, v)

  private val ticks = Seq(
    tick("AAPL", "2024-01-01 10:00:00", 10f, 100),
    tick("AAPL", "2024-01-01 10:01:00", 12f, 50),
    tick("AAPL", "2024-01-01 10:02:00", 9f, 25),
    tick("MSFT", "2024-01-01 10:00:30", 5f, 10))

  test("flatMapGroupsWithState running OHLC matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TickerTick]
    val q = StatefulOps.runningOhlc(mem.toDS())
      .writeStream.format("memory").queryName("ohlc_out").outputMode("append").start()
    try {
      mem.addData(ticks: _*)
      q.processAllAvailable()
      val streaming = spark.table("ohlc_out").as[OhlcSnapshot].collect()
        .map(s => s.ticker -> s).toMap
      val batch = StatefulOps.runningOhlcBatch(spark, ticks.toDS()).collect()
        .map(s => s.ticker -> s).toMap
      assert(streaming === batch)
      val aapl = streaming("AAPL")
      assert(aapl.open === 10f && aapl.high === 12f && aapl.low === 9f && aapl.close === 9f)
      assert(aapl.volume === 175L && aapl.n === 3L)
    } finally q.stop()
  }

  test("state accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TickerTick]
    val q = StatefulOps.runningOhlc(mem.toDS())
      .writeStream.format("memory").queryName("ohlc_acc").outputMode("append").start()
    try {
      mem.addData(tick("AAPL", "2024-01-01 10:00:00", 10f, 100))
      q.processAllAvailable()
      mem.addData(tick("AAPL", "2024-01-01 10:05:00", 20f, 10))
      q.processAllAvailable()
      val rows = spark.table("ohlc_acc").as[OhlcSnapshot].collect()
      // second emission reflects accumulated state
      assert(rows.exists(s => s.high === 20f && s.open === 10f && s.n === 2L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState running Wilder EMA matches the batch twin and the recurrence") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TickerTick]
    val q = StatefulOps.runningEma(mem.toDS(), alpha = 0.5)
      .writeStream.format("memory").queryName("ema_out").outputMode("append").start()
    try {
      mem.addData(ticks: _*)
      q.processAllAvailable()
      val streaming = spark.table("ema_out").as[StatefulOps.EmaSnapshot].collect()
        .map(s => s.ticker -> s).toMap
      val batch = StatefulOps.runningEmaBatch(spark, ticks.toDS(), alpha = 0.5).collect()
        .map(s => s.ticker -> s).toMap
      assert(streaming === batch)
      // AAPL: seed 10 -> 0.5*12+0.5*10 = 11 -> 0.5*9+0.5*11 = 10
      assert(math.abs(streaming("AAPL").ema - 10.0) < 1e-9)
      assert(streaming("AAPL").n === 3L)
      assert(math.abs(streaming("MSFT").ema - 5.0) < 1e-9)
    } finally q.stop()
  }

  test("EMA state carries the recurrence across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TickerTick]
    val q = StatefulOps.runningEma(mem.toDS(), alpha = 0.5)
      .writeStream.format("memory").queryName("ema_acc").outputMode("append").start()
    try {
      mem.addData(tick("AAPL", "2024-01-01 10:00:00", 10f, 1))
      q.processAllAvailable()
      mem.addData(tick("AAPL", "2024-01-01 10:01:00", 20f, 1))
      q.processAllAvailable()
      val rows = spark.table("ema_acc").as[StatefulOps.EmaSnapshot].collect()
      // second emission continues from the first batch's state: 0.5*20+0.5*10
      assert(rows.exists(s => math.abs(s.ema - 15.0) < 1e-9 && s.n === 2L))
    } finally q.stop()
  }

  test("emaFromTrades: the wire-normalized trade stream feeds the EMA state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    def trade(sym: String, tMillis: Long, p: Double) =
      s"""{"c":[],"p":$p,"s":"$sym","t":$tMillis,"v":5}"""
    val normalized = graft.streaming.Pipelines.tradesFromJson(mem.toDF(), "2 minutes")
    val q = graft.streaming.Pipelines.emaFromTrades(normalized, alpha = 0.5)
      .writeStream.format("memory").queryName("ema_wire").outputMode("append").start()
    try {
      val base = 1731681000000L
      mem.addData(trade("AAPL", base, 10.0), trade("AAPL", base + 60000, 20.0))
      q.processAllAvailable()
      val rows = spark.table("ema_wire").as[StatefulOps.EmaSnapshot].collect()
      // seed 10 then 0.5*20 + 0.5*10 = 15
      assert(rows.exists(s => s.ticker == "AAPL" && math.abs(s.ema - 15.0) < 1e-9 && s.n == 2L))
    } finally q.stop()
  }

  test("IVF top-k overlaps exact top-k and is deterministic") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qv = emb.filter($"vec_id" === 0)
      .select(graft.llmops.Similarity.asDouble($"embedding")).collect()(0).getSeq[Double](0)
    val exact = graft.llmops.Similarity.cosineTopK(emb, "vec_id", "embedding", qv, 11)
      .collect().map(_.getLong(0)).toSet - 0L
    val (c, a) = graft.llmops.Similarity.ivfIndex(emb, "vec_id", "embedding", 64, 16)
    val ivf1 = graft.llmops.Similarity.ivfTopK(c, a, qv, 6, 11).collect().map(_.getLong(0)).toSet - 0L
    val ivf2 = graft.llmops.Similarity.ivfTopK(c, a, qv, 6, 11).collect().map(_.getLong(0)).toSet - 0L
    assert(ivf1 === ivf2)
    assert((exact & ivf1).nonEmpty, s"no overlap: exact=$exact ivf=$ivf1")
  }

  test("IVF Lloyd refinement keeps a valid deterministic index and decent recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qv = emb.filter($"vec_id" === 0)
      .select(graft.llmops.Similarity.asDouble($"embedding")).collect()(0).getSeq[Double](0)
    val exact = graft.llmops.Similarity.cosineTopK(emb, "vec_id", "embedding", qv, 11)
      .collect().map(_.getLong(0)).toSet - 0L
    val (c3, a3) = graft.llmops.Similarity.ivfIndex(emb, "vec_id", "embedding", 64, 16, lloydIters = 3)
    // every vector still assigned to exactly one live cell
    assert(a3.count() === emb.count())
    val liveCells = c3.collect().map(_.getInt(0)).toSet
    val usedCells = a3.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(usedCells.subsetOf(liveCells), s"assignment to dead cell: ${usedCells -- liveCells}")
    val ivfA = graft.llmops.Similarity.ivfTopK(c3, a3, qv, 6, 11).collect().map(_.getLong(0)).toSet - 0L
    val ivfB = graft.llmops.Similarity.ivfTopK(c3, a3, qv, 6, 11).collect().map(_.getLong(0)).toSet - 0L
    assert(ivfA === ivfB, "refined index must stay deterministic")
    val recall = (exact & ivfA).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall after refinement too low: $recall (exact=$exact ivf=$ivfA)")
  }

  test("streaming transition pairs chain across micro-batches and match the q108 batch matrix") {
    import graft.streaming.StatefulOps.{TransitionPair, UserEvent}
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, u: Long, typ: String, ts: String) =
      UserEvent(u, Timestamp.valueOf(ts), id, typ)
    val batch1 = Seq(
      ev(1, 1, "a", "2024-01-01 10:00:00"),
      ev(2, 1, "b", "2024-01-01 10:01:00"),   // a->b in-batch
      ev(5, 2, "a", "2024-01-01 10:00:00"))
    val batch2 = Seq(
      ev(3, 1, "b", "2024-01-01 10:02:00"),   // b->b ACROSS the batch boundary
      ev(4, 1, "a", "2024-01-01 10:03:00"),   // b->a in-batch
      ev(6, 2, "b", "2024-01-01 10:01:00"))   // a->b across (user 2)
    val mem = MemoryStream[UserEvent]
    val q = StatefulOps.transitionPairs(mem.toDS())
      .writeStream.format("memory").queryName("trans_out").outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streaming = spark.table("trans_out").as[TransitionPair].collect()
        .groupBy(p => (p.prevType, p.curType)).view.mapValues(_.length.toLong).toMap
      // batch twin over the union of both batches
      val df = (batch1 ++ batch2)
        .map(e => (e.eventId, e.userId, e.eventType, e.ts))
        .toDF("event_id", "user_id", "event_type", "ts")
      val batch = graft.analytics.Behavior
        .transitionMatrix(df, "user_id", "ts", "event_id", "event_type")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
      assert(streaming === batch)
      assert(streaming(("b", "b")) === 1L)   // the cross-batch chain specifically
    } finally q.stop()
  }

  test("streaming drawdown carries spells across micro-batches and matches q145's batch stats") {
    import graft.streaming.StatefulOps.DrawdownSnapshot
    implicit val sqlCtx = spark.sqlContext
    // 10, 8, 9, 10, 12, 11, 12, 13 — the underwaterSpells hand case,
    // split MID-SPELL so the open spell must survive the batch boundary
    val batch1 = Seq(
      tick("A", "2024-01-01 10:00:00", 10f, 1),
      tick("A", "2024-01-01 10:01:00", 8f, 1))    // spell 1 opens
    val batch2 = Seq(
      tick("A", "2024-01-01 10:02:00", 9f, 1),    // spell 1 continues
      tick("A", "2024-01-01 10:03:00", 10f, 1),   // recovery at the tie
      tick("A", "2024-01-01 10:04:00", 12f, 1),
      tick("A", "2024-01-01 10:05:00", 11f, 1),   // spell 2
      tick("A", "2024-01-01 10:06:00", 12f, 1),
      tick("A", "2024-01-01 10:07:00", 13f, 1))
    val mem = MemoryStream[TickerTick]
    val q = StatefulOps.runningDrawdown(mem.toDS())
      .writeStream.format("memory").queryName("dd_out").outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val last = spark.table("dd_out").as[DrawdownSnapshot].collect()
        .filter(_.ticker == "A").maxBy(_.n)
      assert(last.n === 8L)
      assert(last.nSpells === 2L)                      // the split spell counted ONCE
      assert(last.maxUnderwater === 2L)
      assert(last.maxDrawdown === 8.0 / 10.0 - 1.0)    // -0.2
      assert(last.peak === 13.0)
      // equality with the batch window form (q145's operator)
      val df = (batch1 ++ batch2)
        .map(t => (t.datetime, t.ticker, t.price.toDouble))
        .toDF("ts", "sym", "px")
      val w = graft.analytics.Indicators.underwaterSpells(df, "px", Seq("sym"), Seq("ts"))
        .collect().head
      assert(w.getAs[Long]("n_spells") === last.nSpells)
      assert(w.getAs[Long]("max_underwater") === last.maxUnderwater)
      assert(w.getAs[Double]("max_drawdown") ===
        math.floor(last.maxDrawdown * 1e6 + 0.5) / 1e6)
    } finally q.stop()
  }

  test("CUSUM filter samples threshold-crossing moves, accumulators carry across batches") {
    import graft.streaming.StatefulOps.CusumEvent
    implicit val sqlCtx = spark.sqlContext
    // h=3: +event at 13.5 (climb 10->13.5), -event at 9.5 (fall 13.5->9.5
    // after the reset); batch boundary lands MID-climb so S+ must carry
    val batch1 = Seq(
      tick("A", "2024-01-01 10:00:00", 10f, 1),
      tick("A", "2024-01-01 10:01:00", 11f, 1),
      tick("A", "2024-01-01 10:02:00", 12f, 1))     // S+ = 2 at the boundary
    val batch2 = Seq(
      tick("A", "2024-01-01 10:03:00", 13.5f, 1),   // S+ = 3.5 > 3 -> +1, reset
      tick("A", "2024-01-01 10:04:00", 13f, 1),
      tick("A", "2024-01-01 10:05:00", 12f, 1),
      tick("A", "2024-01-01 10:06:00", 9.5f, 1),    // S- = -4 < -3 -> -1, reset
      tick("A", "2024-01-01 10:07:00", 9f, 1))
    val mem = MemoryStream[TickerTick]
    val q = StatefulOps.cusumEvents(mem.toDS(), h = 3.0)
      .writeStream.format("memory").queryName("cusum_out").outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streaming = spark.table("cusum_out").as[CusumEvent].collect().sortBy(_.n)
      assert(streaming.map(e => (e.price, e.direction, e.n)).toSeq ===
        Seq((13.5, 1, 4L), (9.5, -1, 7L)))
      // twin equality: same events however the stream was chopped
      val batch = StatefulOps.cusumEventsBatch(spark, (batch1 ++ batch2).toDS(), 3.0)
        .collect().sortBy(_.n)
      assert(batch.map(e => (e.ticker, e.price, e.direction, e.n)).toSeq ===
        streaming.map(e => (e.ticker, e.price, e.direction, e.n)).toSeq)
    } finally q.stop()
  }

  test("volume bars stream: completed bars match the batch operator across a chopped boundary") {
    import graft.streaming.StatefulOps.VolumeBar
    implicit val sqlCtx = spark.sqlContext
    // threshold 10: bar0 = three v=4 ticks (closes when cum_excl=12
    // lands in bar 1), bar1 = one v=30 print whose size JUMPS the next
    // row to bar 4 (ids 2-3 have no rows, in both forms), bar4 spans
    // the batch boundary, bar5 stays partial (in state, not emitted)
    val batch1 = Seq(
      tick("A", "2024-01-01 10:00:00", 10f, 4),
      tick("A", "2024-01-01 10:01:00", 11f, 4),
      tick("A", "2024-01-01 10:02:00", 12f, 4),
      tick("A", "2024-01-01 10:03:00", 9f, 30),
      tick("A", "2024-01-01 10:04:00", 8f, 1),
      tick("B", "2024-01-01 10:00:00", 5f, 12))
    val batch2 = Seq(
      tick("A", "2024-01-01 10:05:00", 13f, 5),
      tick("A", "2024-01-01 10:06:00", 14f, 6),
      tick("A", "2024-01-01 10:07:00", 15f, 10),
      tick("B", "2024-01-01 10:05:00", 6f, 3))
    val mem = MemoryStream[TickerTick]
    val q = StatefulOps.volumeBarsStream(mem.toDS(), threshold = 10.0)
      .writeStream.format("memory").queryName("vbar_out").outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streaming = spark.table("vbar_out").as[VolumeBar].collect()
        .map(b => (b.ticker, b.bar) -> b).toMap
      // bar 4 spans the boundary: opened by batch1's last tick, fed by
      // batch2, closed by the crossing row — state carried correctly
      assert(streaming.keySet === Set(("A", 0L), ("A", 1L), ("A", 4L), ("B", 0L)))
      assert(streaming(("A", 4L)).nTicks === 3L)
      assert(streaming(("A", 4L)).open === 8f)
      assert(streaming(("A", 4L)).close === 14f)
      // equality with the batch operator (q148's oracle-checked form),
      // completed bars only: the batch form also emits each key's
      // trailing partial bar, which streaming holds in state
      val df = (batch1 ++ batch2)
        .map(t => (t.ticker, t.datetime, t.price.toDouble, t.volume))
        .toDF("sym", "ts", "px", "vol")
      val all = graft.analytics.TimeSeries.volumeBars(
        df, "sym", Seq("ts"), "px", "vol", "ts", 10.0).collect()
      val lastBar = all.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).max).toMap
      val completed = all.filter(r => r.getLong(1) < lastBar(r.getString(0)))
        .map { r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getLong(7)) }
        .toMap
      assert(completed.keySet === streaming.keySet)
      completed.foreach { case (k, (n, o, h, l, c, v)) =>
        val s = streaming(k)
        assert((s.nTicks, s.open.toDouble, s.high.toDouble, s.low.toDouble, s.close.toDouble, s.volume) ===
          ((n, o, h, l, c, v)), s"bar $k disagrees")
      }
    } finally q.stop()
  }

  test("PSI drift stream: reference seals across a chopped boundary, final snapshot matches batch") {
    import graft.streaming.StatefulOps.PsiSnapshot
    implicit val sqlCtx = spark.sqlContext
    // refCount=4, bins=2: A's reference is 1,2,3,4 (mn=1, mx=4 ->
    // refHist [2,2]); the boundary lands MID-REFERENCE (after two
    // values) so the unsealed buffer must carry; both current prints
    // land in bin 1 -> curHist [0,2]. Hand PSI with Laplace smoothing:
    //   p=(3/6, 3/6), q=(1/4, 3/4)
    //   (0.5-0.25)ln(2) + (0.5-0.75)ln(2/3) = 0.274653 (floored 1e-6)
    // B never reaches refCount -> psi stays null.
    val batch1 = Seq(
      tick("A", "2024-01-01 10:00:00", 1f, 1),
      tick("A", "2024-01-01 10:01:00", 2f, 1),
      tick("B", "2024-01-01 10:00:00", 7f, 1))
    val batch2 = Seq(
      tick("A", "2024-01-01 10:02:00", 3f, 1),
      tick("A", "2024-01-01 10:03:00", 4f, 1),
      tick("A", "2024-01-01 10:04:00", 4f, 1),
      tick("A", "2024-01-01 10:05:00", 4f, 1),
      tick("B", "2024-01-01 10:01:00", 8f, 1))
    val mem = MemoryStream[TickerTick]
    val q = StatefulOps.psiDriftStream(mem.toDS(), refCount = 4, bins = 2)
      .writeStream.format("memory").queryName("psi_out").outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val snaps = spark.table("psi_out").as[PsiSnapshot].collect()
      // first micro-batch: A mid-reference -> psi null
      assert(snaps.exists(s => s.ticker == "A" && s.n_ref == 2L && s.psi.isEmpty))
      val aFinal = snaps.filter(_.ticker == "A").maxBy(s => s.n_ref + s.n_cur)
      assert(aFinal.n_ref === 4L && aFinal.n_cur === 2L)
      assert(aFinal.psi === Some(0.274653))
      val bFinal = snaps.filter(_.ticker == "B").maxBy(s => s.n_ref + s.n_cur)
      assert(bFinal.n_ref === 2L && bFinal.psi.isEmpty)
      // twin equality: same final snapshots however the stream was chopped
      val batch = StatefulOps.psiDriftBatch(spark, (batch1 ++ batch2).toDS(), refCount = 4, bins = 2)
        .collect().map(s => s.ticker -> s).toMap
      assert(batch("A") === aFinal)
      assert(batch("B") === bFinal)
    } finally q.stop()
  }

  test("Kalman filter stream: gain recurrence carries across a chopped boundary, matches batch") {
    import graft.streaming.StatefulOps.KalmanPoint
    implicit val sqlCtx = spark.sqlContext
    // q=1, r=10. Seed x=10, p=10, k=1. Second obs z=20:
    //   pPred=11, k=11/21, x=10+(11/21)*10, p=(10/21)*11
    // the boundary lands between obs 2 and 3, so (x, p) must carry.
    val batch1 = Seq(
      tick("A", "2024-01-01 10:00:00", 10f, 1),
      tick("A", "2024-01-01 10:01:00", 20f, 1))
    val batch2 = Seq(
      tick("A", "2024-01-01 10:02:00", 15f, 1),
      tick("A", "2024-01-01 10:03:00", 12f, 1))
    val mem = MemoryStream[TickerTick]
    val q = StatefulOps.kalmanFilterStream(mem.toDS(), qVar = 1.0, rVar = 10.0)
      .writeStream.format("memory").queryName("kf_out").outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streaming = spark.table("kf_out").as[KalmanPoint].collect().sortBy(_.n)
      assert(streaming.length === 4)
      assert(streaming(0).x_hat === 10.0 && streaming(0).k_gain === 1.0)
      val k2 = 11.0 / 21.0
      val x2 = 10.0 + k2 * 10.0
      assert(streaming(1).x_hat === x2 && streaming(1).k_gain === k2)
      // third point exercises the carried (x, p): p2 = (1-k2)*11
      val p2 = (1.0 - k2) * 11.0
      val k3 = (p2 + 1.0) / ((p2 + 1.0) + 10.0)
      val x3 = x2 + k3 * (15.0 - x2)
      assert(streaming(2).x_hat === x3 && streaming(2).k_gain === k3)
      // gain DECAYS toward steady state as uncertainty resolves
      assert(streaming(1).k_gain > streaming(2).k_gain)
      assert(streaming(2).k_gain > streaming(3).k_gain)
      // twin equality, bit-exact: same trajectory however chopped
      val batch = StatefulOps.kalmanFilterBatch(
        spark, (batch1 ++ batch2).toDS(), qVar = 1.0, rVar = 10.0)
        .collect().sortBy(_.n)
      assert(batch.toSeq === streaming.toSeq)
    } finally q.stop()
  }

  test("z-score anomaly stream: prior-only scoring, integer state carries across the boundary") {
    import graft.streaming.StatefulOps.AnomalyEvent
    implicit val sqlCtx = spark.sqlContext
    // five quiet ticks seed the state in batch 1; batch 2 opens with a
    // spike that must be scored against the CARRIED prior stats (its
    // own value excluded), then a second quiet tick that must not fire
    val batch1 = (0 until 5).map(i =>
      tick("A", f"2024-01-01 10:0$i%01d:00", 10f + (i % 2), 1))
    val batch2 = Seq(
      tick("A", "2024-01-01 10:05:00", 50f, 1),   // z >> 3 vs prior 10-11
      tick("A", "2024-01-01 10:06:00", 10.5f, 1)) // quiet (variance now wide)
    val mem = MemoryStream[TickerTick]
    val q = StatefulOps.zScoreAnomalies(mem.toDS(), threshold = 3.0, minPrior = 5)
      .writeStream.format("memory").queryName("z_out").outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streaming = spark.table("z_out").as[AnomalyEvent].collect()
      assert(streaming.length === 1)
      assert(streaming.head.price === 50.0 && streaming.head.n_prior === 5L)
      assert(streaming.head.z > 3.0)
      // bit-exact twin equality across the chop
      val batch = StatefulOps.zScoreAnomaliesBatch(
        spark, (batch1 ++ batch2).toDS(), threshold = 3.0, minPrior = 5).collect()
      assert(batch.toSeq === streaming.toSeq)
    } finally q.stop()
  }

  test("streaming near-dup marks equal the batch twin under chopping AND within-watermark disorder (watermark-complete emission)") {
    import StatefulOps.{BandOccurrence, NearDupMark}
    implicit val sqlCtx = spark.sqlContext
    def occ(band: Int, value: Long, id: Long, tsSec: Int) = BandOccurrence(
      s"$band:$value", band, id,
      Timestamp.valueOf(f"2024-01-01 10:${tsSec / 60}%02d:${tsSec % 60}%02d"))
    // band (0, 7): ids 1, 2, 3 within a 120 s horizon; id 2 arrives LATE
    // (after id 3, within the 5-minute watermark delay) but is the
    // earlier event — watermark-complete emission must still mark 3
    // against 2's predecessor 1, and mark 2 against 1, identically to
    // the batch twin. band (1, 9): a lone doc, never marked.
    val batch1 = Seq(occ(0, 7, 1L, 0), occ(0, 7, 3L, 100), occ(1, 9, 50L, 10))
    val batch2 = Seq(occ(0, 7, 2L, 40))                  // late, in-watermark
    val batch3 = Seq(occ(0, 7, 4L, 300))                 // out of horizon of 1-3
    // sentinel far in the future: advances the watermark past every real
    // event so all marks become final and flush (its own band is ignored)
    val sentinel = Seq(occ(5, 999L, -1L, 3500))
    val mem = MemoryStream[BandOccurrence]
    val q = StatefulOps.nearDupMarks(
        mem.toDS().withWatermark("datetime", "5 minutes"), horizonMs = 120000L)
      .writeStream.format("memory").queryName("ndm_out").outputMode("append").start()
    try {
      Seq(batch1, batch2, batch3, sentinel).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      // event-time timeouts fire on the batch AFTER the watermark
      // advances — one more empty nudge flushes the remaining finals
      mem.addData(occ(5, 999L, -2L, 3590)); q.processAllAvailable()
      Option(q.exception.orNull).foreach(throw _)
      val streaming = spark.table("ndm_out").as[NearDupMark].collect()
        .filter(_.band != 5).toSet
      val events = batch1 ++ batch2 ++ batch3
      val batch = StatefulOps.nearDupMarksBatch(
        spark, events.toDS(), horizonMs = 120000L).collect().toSet
      assert(batch === Set(NearDupMark(2L, 0, 1L), NearDupMark(3L, 0, 1L)),
        s"twin contract: 2 and 3 mark against 1; 4 out of horizon; 50 alone: $batch")
      assert(streaming === batch,
        s"stream must equal the twin despite disorder: $streaming vs $batch")
    } finally q.stop()
  }

  test("streaming feed gaps equal the batch twin AND the window form under chopping and disorder") {
    import StatefulOps.{FeedGap, KeyedEvent}
    implicit val sqlCtx = spark.sqlContext
    def ev(key: String, sec: Int) = KeyedEvent(key,
      Timestamp.valueOf(f"2024-01-01 10:${sec / 60}%02d:${sec % 60}%02d"))
    val maxGapUs = 60L * 1000000L // 1 minute cadence bound
    // key A: events at 0, 30, then silence to 200 (gap), 220, then 400
    // (gap) — the 200 event arrives LATE (after 220, within watermark);
    // key B: a lone event, no gap; duplicate event at A/30 must not
    // split the chain
    val batch1 = Seq(ev("A", 0), ev("A", 30), ev("A", 30), ev("A", 220), ev("B", 10))
    val batch2 = Seq(ev("A", 200)) // late-but-in-watermark
    val batch3 = Seq(ev("A", 400))
    val sentinel = Seq(ev("Z", 3000))
    val mem = MemoryStream[KeyedEvent]
    val q = StatefulOps.feedGapsStream(
        mem.toDS().withWatermark("datetime", "5 minutes"), maxGapUs)
      .writeStream.format("memory").queryName("gap_out").outputMode("append").start()
    try {
      Seq(batch1, batch2, batch3, sentinel).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      mem.addData(ev("Z", 3500)); q.processAllAvailable()
      Option(q.exception.orNull).foreach(throw _)
      val streaming = spark.table("gap_out").as[FeedGap].collect()
        .filter(_.key != "Z").sortBy(g => (g.key, g.gap_start.getTime))
      val events = batch1 ++ batch2 ++ batch3
      val batch = StatefulOps.feedGapsBatch(spark, events.toDS(), maxGapUs)
        .collect().filter(_.key != "Z").sortBy(g => (g.key, g.gap_start.getTime))
      assert(streaming.toSeq === batch.toSeq,
        s"stream must equal the twin despite the late event: " +
          s"${streaming.toSeq} vs ${batch.toSeq}")
      // semantics: the late 200 event SPLITS what would otherwise be a
      // single 30->220 gap into 30->200 and leaves 200->220 under the
      // bound; 220->400 is the second gap
      assert(batch.map(g => (g.gap_start.getTime, g.gap_end.getTime)).toSeq ===
        Seq((30000L + tsBase, 200000L + tsBase), (220000L + tsBase, 400000L + tsBase)))
      // and the window-based production form agrees
      val viaWindow = graft.analytics.TimeSeries.feedGaps(
          events.toDS().toDF(), "key", "datetime", maxGapUs)
        .as[FeedGap].collect().filter(_.key != "Z")
        .sortBy(g => (g.key, g.gap_start.getTime))
      assert(viaWindow.toSeq === batch.toSeq)
    } finally q.stop()
  }

  private lazy val tsBase: Long =
    Timestamp.valueOf("2024-01-01 10:00:00").getTime

  test("streaming feed reconciliation equals the batch twin AND the relational forms under chopping") {
    import StatefulOps.{FeedSideRow, ReconVerdict}
    implicit val sqlCtx = spark.sqlContext
    def at(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    def side(key: String, min: Int, sd: String, vol: Long, px: Double) =
      FeedSideRow(key, at(min), sd, vol, px)
    // five buckets covering every lane; the SIDES of buckets 0 and 2
    // arrive in DIFFERENT batches (the chop-invariance pin): the
    // watermark (10 min delay) stays below the buckets until the late
    // sentinels, so presence is decided watermark-complete, never from
    // arrival order
    val batch1 = Seq(
      side("A", 0, "bar", 100L, 10.0),              // ok (trade in batch 2)
      side("A", 2, "trade", 100L, 10.0),            // missing_in_bars
      side("A", 4, "bar", 107L, 10.0),              // volume_mismatch
      side("A", 6, "bar", 100L, 10.9))              // price_mismatch (trade later)
    val batch2 = Seq(
      side("A", 0, "trade", 100L, 10.0),
      side("A", 4, "trade", 100L, 10.0),
      side("A", 6, "trade", 100L, 10.0),
      side("A", 8, "bar", 50L, 5.0))                // missing_in_trades (phantom)
    val sent1 = Seq(side("Z", 60, "trade", 1L, 1.0))
    val sent2 = Seq(side("Z", 90, "trade", 1L, 1.0))
    val mem = MemoryStream[FeedSideRow]
    val q = StatefulOps.reconcileFeedsStream(
        mem.toDS().withWatermark("bucket", "10 minutes"), priceTol = 0.5)
      .writeStream.format("memory").queryName("recon_out").outputMode("append").start()
    try {
      Seq(batch1, batch2, sent1, sent2).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      Option(q.exception.orNull).foreach(throw _)
      val streaming = spark.table("recon_out").as[ReconVerdict].collect()
        .filter(_.key != "Z").sortBy(_.bucket.getTime)
      val sides = batch1 ++ batch2
      val twin = StatefulOps.reconcileFeedsBatch(spark, sides.toDS(), priceTol = 0.5)
        .collect().sortBy(_.bucket.getTime)
      assert(streaming.toSeq === twin.toSeq,
        s"stream must equal the twin under the side-splitting chop:\n" +
          s"${streaming.toSeq}\nvs\n${twin.toSeq}")
      assert(streaming.map(v => (v.lane, v.action)).toSeq === Seq(
        ("ok", "kept_bar"), ("missing_in_bars", "backfilled"),
        ("volume_mismatch", "overridden"), ("price_mismatch", "overridden"),
        ("missing_in_trades", "dropped_phantom")), streaming.toSeq.toString)
      // healed values follow the trades-are-ground-truth policy
      assert(streaming.map(v => (v.healed_volume, v.healed_price)).toSeq === Seq(
        (Some(100L), Some(10.0)), (Some(100L), Some(10.0)),
        (Some(100L), Some(10.0)), (Some(100L), Some(10.0)), (None, None)))
      // ... and the relational forms agree lane-for-lane on the same grains
      val barsDf = sides.filter(_.side == "bar").toDS().toDF()
        .select(col("key"), col("bucket"), col("volume").as("bv"), col("price").as("bp"))
      val tradesDf = sides.filter(_.side == "trade").toDS().toDF()
        .select(col("key"), col("bucket"), col("volume").as("tv"), col("price").as("tp"))
      val rel = graft.ingest.Ingest.reconcileFeeds(barsDf, tradesDf,
          "key", "bucket", "bv", "tv", "bp", "tp", priceTol = 0.5)
        .select(col("bucket"), col("lane"))
        .collect().map(r => r.getTimestamp(0).getTime -> r.getString(1)).toMap
      streaming.foreach { v =>
        assert(rel(v.bucket.getTime) === v.lane,
          s"relational lane differs at ${v.bucket}: ${rel(v.bucket.getTime)} vs ${v.lane}")
      }
    } finally q.stop()
  }

  test("streaming feed reconciliation: duplicate grain rows fail loudly") {
    import StatefulOps.FeedSideRow
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val mem = MemoryStream[FeedSideRow]
    val q = StatefulOps.reconcileFeedsStream(
        mem.toDS().withWatermark("bucket", "10 minutes"), priceTol = 0.5)
      .writeStream.format("memory").queryName("recon_dup_out").outputMode("append").start()
    try {
      mem.addData(FeedSideRow("A", t0, "bar", 1L, 1.0),
        FeedSideRow("A", t0, "bar", 2L, 2.0))
      val e = intercept[Exception] { q.processAllAvailable() }
      val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
      assert(chain.contains("duplicate bar grain row"), chain)
    } finally q.stop()
  }

  test("hot-band cap: past maxBandEntries, occurrences take the loud dup_of = -1 saturated lane") {
    import StatefulOps.{BandOccurrence, NearDupMark}
    implicit val sqlCtx = spark.sqlContext
    def occ(id: Long, tsSec: Int) = BandOccurrence(
      "0:7", 0, id,
      Timestamp.valueOf(f"2024-01-01 10:${tsSec / 60}%02d:${tsSec % 60}%02d"))
    // one adversarial band, cap 1: id 1 is admitted (lowest (ts, id)
    // first — deterministic within the batch), 2 and 3 overflow and
    // must surface as SATURATED marks, not silently pass unmarked
    val batch1 = Seq(occ(1L, 0), occ(2L, 10), occ(3L, 20))
    val sentinel = Seq(BandOccurrence("5:999", 5, -1L,
      Timestamp.valueOf("2024-01-01 11:00:00")))
    val mem = MemoryStream[BandOccurrence]
    val q = StatefulOps.nearDupMarks(
        mem.toDS().withWatermark("datetime", "1 minute"),
        horizonMs = 120000L, maxBandEntries = 1)
      .writeStream.format("memory").queryName("sat_out").outputMode("append").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(sentinel: _*); q.processAllAvailable()
      mem.addData(BandOccurrence("5:999", 5, -2L,
        Timestamp.valueOf("2024-01-01 11:05:00"))); q.processAllAvailable()
      Option(q.exception.orNull).foreach(throw _)
      val marks = spark.table("sat_out").as[NearDupMark].collect()
        .filter(_.band != 5).toSet
      assert(marks === Set(
        NearDupMark(2L, 0, StatefulOps.SaturatedDupOf),
        NearDupMark(3L, 0, StatefulOps.SaturatedDupOf)),
        s"cap=1 admits only id 1; 2 and 3 must land the saturated lane: $marks")
    } finally q.stop()
  }

  test("hot-band cap: watermark-evictable entries free cap room BEFORE admission") {
    // r15 advice: cap room must be computed against the watermark-
    // evicted residents — an entry the current watermark already makes
    // evictable (ts < wm - horizon) cannot precede any future-final
    // occurrence, so it must not spuriously saturate a fresh arrival in
    // exactly the batch where eviction would free its slot.
    import StatefulOps.{BandOccurrence, NearDupMark}
    implicit val sqlCtx = spark.sqlContext
    def at(hms: String) = Timestamp.valueOf(s"2024-01-01 $hms")
    val mem = MemoryStream[BandOccurrence]
    val q = StatefulOps.nearDupMarks(
        mem.toDS().withWatermark("datetime", "1 minute"),
        horizonMs = 120000L, maxBandEntries = 1)
      .writeStream.format("memory").queryName("evict_room_out")
      .outputMode("append").start()
    try {
      // fills the cap=1 band
      mem.addData(BandOccurrence("0:7", 0, 1L, at("10:00:00")))
      q.processAllAvailable()
      // advances the watermark to 10:19 — entry 1 becomes evictable
      // (10:00 < 10:19 - 2min) without band 0:7 being woken
      mem.addData(BandOccurrence("5:999", 5, -1L, at("10:20:00")))
      q.processAllAvailable()
      // arrives in the same invocation that evicts entry 1: must be
      // ADMITTED (clean — 20 min from entry 1, far outside the 2-min
      // horizon), not routed to the saturated lane by a stale cap count
      mem.addData(BandOccurrence("0:7", 0, 4L, at("10:20:10")))
      q.processAllAvailable()
      // advance far enough to flush doc 4's verdict
      mem.addData(BandOccurrence("5:999", 5, -2L, at("10:40:00")))
      q.processAllAvailable()
      mem.addData(BandOccurrence("5:999", 5, -3L, at("10:45:00")))
      q.processAllAvailable()
      Option(q.exception.orNull).foreach(throw _)
      val marks = spark.table("evict_room_out").as[NearDupMark].collect()
        .filter(_.band != 5).toSet
      assert(marks.isEmpty,
        s"doc 4 must be admitted into the freed slot (clean, no mark): $marks")
    } finally q.stop()
  }

  test("duplicate (band, doc) occurrences never mark a doc against itself") {
    import StatefulOps.{BandOccurrence, NearDupMark}
    val ts = Timestamp.valueOf("2024-01-01 10:00:00")
    // the same (ts, id) occurrence repeated — the r14-advice trap: a
    // strict-tuple read over the raw seq would report dup_of == doc_id
    val occs = Seq(
      BandOccurrence("0:7", 0, 1L, ts),
      BandOccurrence("0:7", 0, 1L, ts))
    val marks = StatefulOps.nearDupMarksBatch(spark, occs.toDS(), 120000L).collect()
    assert(marks.isEmpty, s"a doc repeated in one band is not its own dup: ${marks.toSeq}")
    // and a genuine later doc still marks against the deduplicated earlier one
    val withLater = occs :+ BandOccurrence("0:7", 0, 2L,
      Timestamp.valueOf("2024-01-01 10:01:00"))
    val m2 = StatefulOps.nearDupMarksBatch(spark, withLater.toDS(), 120000L).collect()
    assert(m2.toSeq === Seq(NearDupMark(2L, 0, 1L)))
  }

  test("streaming as-of enrichment equals the batch twin AND asOfJoinTolerance under chopping and disorder") {
    import StatefulOps.{AsOfEnriched, AsOfInput}
    implicit val sqlCtx = spark.sqlContext
    def in(key: String, tsSec: Int, isQuote: Boolean, id: Long, v: Double) =
      AsOfInput(key,
        Timestamp.valueOf(f"2024-01-01 10:${tsSec / 60}%02d:${tsSec % 60}%02d"),
        isQuote, id, v)
    val tolUs = 100L * 1000000L // 100 s staleness bound
    // key A: quote at t0; trades at t30 (matches t0), t55 (must match
    // the LATE quote t50 that arrives one batch later, within the
    // watermark), t200 (latest quote t50 is 150 s stale -> null match).
    // key B: a trade with no quote at all -> null match.
    val batch1 = Seq(
      in("A", 0, isQuote = true, 100L, 10.0),
      in("A", 30, isQuote = false, 1L, 1.0),
      in("A", 55, isQuote = false, 2L, 2.0))
    val batch2 = Seq(
      in("A", 50, isQuote = true, 101L, 11.0), // late-but-in-watermark quote
      in("B", 60, isQuote = false, 3L, 3.0))
    val batch3 = Seq(in("A", 200, isQuote = false, 4L, 4.0))
    val sentinel = in("Z", 3000, isQuote = true, 999L, 0.0)
    val mem = MemoryStream[AsOfInput]
    val q = StatefulOps.asOfEnrichStream(
        mem.toDS().withWatermark("datetime", "2 minutes"), tolUs)
      .writeStream.format("memory").queryName("asof_out").outputMode("append").start()
    try {
      Seq(batch1, batch2, batch3, Seq(sentinel)).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      mem.addData(in("Z", 3100, isQuote = true, 998L, 0.0)); q.processAllAvailable()
      Option(q.exception.orNull).foreach(throw _)
      val streaming = spark.table("asof_out").as[AsOfEnriched].collect()
        .filter(_.key != "Z").sortBy(_.id)
      val events = batch1 ++ batch2 ++ batch3
      val batch = StatefulOps.asOfEnrichBatch(spark, events.toDS(), tolUs)
        .collect().filter(_.key != "Z").sortBy(_.id)
      assert(streaming.toSeq === batch.toSeq,
        s"stream must equal the twin despite the late quote: " +
          s"${streaming.toSeq} vs ${batch.toSeq}")
      // the twin itself carries the intended semantics
      assert(batch.map(e => e.id -> e.quote_value).toMap ===
        Map(1L -> Some(10.0), 2L -> Some(11.0), 3L -> None, 4L -> None))
      assert(batch.find(_.id == 2L).get.lag_us === Some(5000000L))
      // and equals the PRODUCTION batch form (one window pass, no
      // per-key lists) on the same frames
      val all = events.toDS().toDF()
      val trades = all.filter(!col("isQuote"))
        .select(col("key"), col("id"), col("datetime"), col("value"))
      val quotes = all.filter(col("isQuote"))
        .select(col("key"), col("datetime"),
          col("datetime").as("quote_ts"), col("value").as("quote_value"))
      val viaWindow = graft.analytics.TimeSeries.asOfJoinTolerance(
          trades, quotes, "key", "datetime", "datetime",
          Seq("quote_ts", "quote_value"), tolUs)
        .collect().map { r =>
          (r.getString(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3),
            Option(r.getTimestamp(4)), Option(r.get(5)).map(_.asInstanceOf[Double]),
            Option(r.get(6)).map(_.asInstanceOf[Long]))
        }.sortBy(_._2)
      val twin = batch.map(e => (e.key, e.id, e.datetime, e.value,
        e.quote_ts, e.quote_value, e.lag_us)).toSeq
      assert(viaWindow.toSeq === twin,
        s"fold twin must equal asOfJoinTolerance: ${viaWindow.toSeq} vs $twin")
    } finally q.stop()
  }
}
