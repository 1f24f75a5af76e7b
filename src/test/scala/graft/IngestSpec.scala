package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ingest.Ingest

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val barJson =
    """{"Datetime":"2024-11-15T14:30:00.000Z","Open":224.75,"High":225.1,"Low":224.6,"Close":224.98,"Adj Close":224.98,"Volume":183024,"Dividends":0.0,"Stock Splits":0.0,"ticker":"AAPL"}"""
  private val tradeJson =
    """{"c":["1","12"],"p":224.91,"s":"AAPL","t":1731681000123,"v":50}"""

  test("normalizeBars parses, renames spaced columns, attaches deterministic id") {
    val out = Ingest.normalizeBars(Seq(barJson).toDF("value"))
    assert(out.columns.toSet === Set("id", "datetime", "open", "high", "low", "close",
      "adj_close", "volume", "dividends", "stock_splits", "ticker"))
    val row = out.collect().head
    assert(row.getAs[String]("ticker") === "AAPL")
    assert(row.getAs[Float]("adj_close") === 224.98f)
    assert(row.getAs[Timestamp]("datetime") === Timestamp.valueOf("2024-11-15 14:30:00"))
    // id is a content hash: same input -> same id (idempotent retries)
    val again = Ingest.normalizeBars(Seq(barJson).toDF("value")).collect().head
    assert(row.getAs[String]("id") === again.getAs[String]("id"))
    assert(row.getAs[String]("id").length === 64)
  }

  test("normalizeTrades keeps millisecond precision (timestamp_millis, not from_unixtime)") {
    val out = Ingest.normalizeTrades(Seq(tradeJson).toDF("value")).collect().head
    // 1731681000123 ms = 2024-11-15T14:30:00.123Z — the reference's
    // from_unixtime(t/1000) would truncate the .123
    assert(out.getAs[Timestamp]("datetime").getTime === 1731681000123L)
    assert(out.getAs[Seq[String]]("trade_conditions") === Seq("1", "12"))
    assert(out.getAs[Int]("volume") === 50)
  }

  test("typed Dataset boundary: Bar/Trade case classes round-trip") {
    val bars = Ingest.barsTyped(Ingest.normalizeBars(Seq(barJson).toDF("value")))
    val b = bars.collect().head
    assert(b.ticker === "AAPL" && b.close === 224.98f && b.volume === 183024)
    val trades = Ingest.tradesTyped(Ingest.normalizeTrades(Seq(tradeJson).toDF("value")))
    val tr = trades.collect().head
    assert(tr.symbol === "AAPL" && tr.trade_conditions === Seq("1", "12"))
  }

  test("malformed JSON yields an all-null row (PERMISSIVE), gate drops it") {
    val out = Ingest.normalizeBars(Seq("{not json", barJson).toDF("value"))
    assert(out.count() === 2)
    assert(Ingest.gateBars(out).count() === 1)
  }

  test("gates drop volume<=0 and null key") {
    val v0 = barJson.replace("183024", "0")
    val noTicker = barJson.replace(""","ticker":"AAPL"""", "")
    val out = Ingest.gateBars(Ingest.normalizeBars(Seq(barJson, v0, noTicker).toDF("value")))
    assert(out.count() === 1)
  }

  test("inUniverse keeps only universe members") {
    val df = Seq("AAPL", "ZZZZ").toDF("ticker")
    assert(Ingest.inUniverse("ticker", Seq("AAPL", "MSFT"))(df).collect().map(_.getString(0)).toSeq === Seq("AAPL"))
  }

  test("dedupFirstBy is deterministic and idempotent") {
    val df = Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30)).toDF("seq", "key", "v")
    val once = Ingest.dedupFirstBy(Seq("key"), "seq")(df)
    assert(once.orderBy("key").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (3L, "b")))
    // idempotence: dedup(dedup(x)) == dedup(x); dedup(x ++ x) == dedup(x)
    val doubled = Ingest.dedupFirstBy(Seq("key"), "seq")(df.union(df))
    assert(doubled.count() === 2)
  }

  test("nthLatestPerKey picks the last *closed* bar (offset 2)") {
    val df = Seq(
      ("AAPL", "2024-01-01 10:01:00", 1.0), // closed
      ("AAPL", "2024-01-01 10:02:00", 2.0), // still forming (latest)
      ("MSFT", "2024-01-01 10:02:00", 9.0)
    ).toDF("ticker", "dt", "close").withColumn("dt", col("dt").cast("timestamp"))
    val out = Ingest.nthLatestPerKey(Seq("ticker"), "dt", 2)(df)
    assert(out.collect().map(r => (r.getString(0), r.getDouble(2))).toSet === Set(("AAPL", 1.0)))
  }

  test("barsWithDeadLetter: every payload lands in exactly one lane, raw preserved, ids only on good rows") {
    def bar(ticker: String, vol: Int): String =
      s"""{"Datetime":"2024-11-15T14:30:00.000Z","Open":1.0,"High":2.0,"Low":0.5,"Close":1.5,"Adj Close":1.5,"Volume":$vol,"Dividends":0.0,"Stock Splits":0.0,"ticker":"$ticker"}"""
    val noTicker =
      """{"Datetime":"2024-11-15T14:30:00.000Z","Open":1.0,"High":2.0,"Low":0.5,"Close":1.5,"Adj Close":1.5,"Volume":7,"Dividends":0.0,"Stock Splits":0.0}"""
    val wire = Seq(
      bar("AAPL", 100),          // good
      bar("AAPL", 100).take(30), // truncated -> malformed
      noTicker,                  // unkeyable
      bar("MSFT", 0)             // gate failure
    ).toDF("value")
    val rows = Ingest.barsWithDeadLetter(wire).collect()
      .map(r => Option(r.getAs[String]("dead_reason")).getOrElse("good") ->
        (r.getAs[String]("raw"), r.getAs[String]("id"))).toMap
    assert(rows.keySet === Set("good", "malformed_json", "missing_key", "gate_volume"))
    // raw payload rides every lane byte-for-byte (replayability)
    assert(rows("malformed_json")._1 === bar("AAPL", 100).take(30))
    assert(rows("missing_key")._1 === noTicker)
    // ids only on good rows, and identical to the normalizeBars id
    assert(rows("malformed_json")._2 == null && rows("gate_volume")._2 == null)
    val normId = Ingest.normalizeBars(Seq(bar("AAPL", 100)).toDF("value"))
      .collect()(0).getAs[String]("id")
    assert(rows("good")._2 === normId,
      "dead-letter path must assign the same deterministic id as the plain path")
  }

  test("tradesWithDeadLetter: same lane contract on the Finnhub wire shape") {
    def trade(sym: String, vol: Int): String =
      s"""{"c":["1","12"],"p":150.25,"s":"$sym","t":1731680100123,"v":$vol}"""
    val noSymbol = """{"c":["1"],"p":10.0,"t":1731680100123,"v":5}"""
    val wire = Seq(
      trade("AAPL", 9),
      trade("AAPL", 9).take(20), // truncated -> malformed
      noSymbol,                  // unkeyable
      trade("MSFT", 0)           // gate failure
    ).toDF("value")
    val rows = Ingest.tradesWithDeadLetter(wire).collect()
      .map(r => Option(r.getAs[String]("dead_reason")).getOrElse("good") ->
        (r.getAs[String]("raw"), r.getAs[String]("id"))).toMap
    assert(rows.keySet === Set("good", "malformed_json", "missing_key", "gate_volume"))
    assert(rows("malformed_json")._1 === trade("AAPL", 9).take(20))
    assert(rows("missing_key")._2 == null && rows("gate_volume")._2 == null)
    val normId = Ingest.normalizeTrades(Seq(trade("AAPL", 9)).toDF("value"))
      .collect()(0).getAs[String]("id")
    assert(rows("good")._2 === normId,
      "trade dead-letter path must assign the same deterministic id as the plain path")
  }

  test("dead-letter REPLAY: mechanical repair of invertible corruption lands id-parity with the clean run (r13 item 3)") {
    import org.apache.spark.sql.functions._
    def bar(ticker: String, vol: Int, minute: Int): String =
      f"""{"Datetime":"2024-11-15T14:$minute%02d:00.000Z","Open":1.0,"High":2.0,"Low":0.5,"Close":1.5,"Adj Close":1.5,"Volume":$vol%d,"Dividends":0.0,"Stock Splits":0.0,"ticker":"$ticker%s"}"""
    val clean = (0 until 12).map(i => bar(s"T${i % 4}", if (i % 6 == 0) 0 else i, i))
    val corrupt = clean.zipWithIndex.map {
      case (p, i) if i % 3 == 0 => "XX" + p                          // malformed
      case (p, i) if i % 3 == 1 => p.replace("\"ticker\":", "\"tickr\":") // unkeyable
      case (p, _) => p
    }
    val routed = Ingest.barsWithDeadLetter(corrupt.toDF("value"))
    val dead = routed.filter(
      col("dead_reason").isin("malformed_json", "missing_key"))
    val repaired = dead.select(
      regexp_replace(
        when(col("raw").startsWith("XX"), expr("substring(raw, 3)"))
          .otherwise(col("raw")),
        lit("\"tickr\":"), lit("\"ticker\":")).as("value"))
    val replayedGood = Ingest.barsWithDeadLetter(repaired)
      .filter(col("dead_reason").isNull).select("id")
    val unionGood = routed.filter(col("dead_reason").isNull).select("id")
      .unionByName(replayedGood)
    val cleanGood = Ingest.barsWithDeadLetter(clean.toDF("value"))
      .filter(col("dead_reason").isNull).select("id")
    assert(unionGood.exceptAll(cleanGood).isEmpty &&
      cleanGood.exceptAll(unionGood).isEmpty,
      "good + replayed must equal the clean run id-for-id (multiset)")
    // genuine data failures stay dead on replay: the zero-volume rows
    // (i % 6 == 0) re-enter gate_volume, never the good lane
    val replayLanes = Ingest.barsWithDeadLetter(repaired)
      .groupBy(coalesce(col("dead_reason"), lit("good"))).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(replayLanes.getOrElse("gate_volume", 0L) === 2L,
      s"i=0 and i=6 are zero-volume and corrupted (i%3 in {0,1}) -> " +
        s"repaired but still gated: $replayLanes")
    assert(!replayLanes.contains("malformed_json") && !replayLanes.contains("missing_key"),
      s"repair must clear both producer-corruption lanes: $replayLanes")
  }

  test("wireSchemaProfile: sorted-key signatures, unknown/missing counts, malformed lane") {
    import spark.implicits._
    val wire = Seq(
      """{"a":1,"b":2}""",          // exact (declared a,b)
      """{"b":2,"a":1}""",          // same signature, different key order
      """{"a":1,"b":2,"c":3}""",    // unknown c
      """{"a":1}""",                // missing b
      """{"c":1,"d":2}""",          // 2 unknown, 2 missing
      """not json at all"""         // malformed
    ).toDF("value")
    val out = Ingest.wireSchemaProfile(wire, Seq("a", "b"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3), r.getInt(4))).toSet
    assert(out === Set(
      ("a,b", "declared_exact", 2L, 0, 0),  // key order collapses
      ("a,b,c", "drifted", 1L, 1, 0),
      ("a", "drifted", 1L, 0, 1),
      ("c,d", "drifted", 1L, 2, 2),
      ("<malformed>", "malformed", 1L, 0, 0)), out.toString)
  }

  test("reconcileFeeds: exactly one lane per (key, bucket), precedence presence > volume > price") {
    import spark.implicits._
    // trades grain is the base truth; bars deviate one way per bucket
    val trades = Seq(
      ("A", 1L, 100L, 10.0), // ok
      ("A", 2L, 100L, 10.0), // bar missing
      ("A", 3L, 100L, 10.0), // volume mismatch (and price off: volume wins)
      ("A", 4L, 100L, 10.0)  // price mismatch
    ).toDF("key", "bucket", "t_vol", "t_px")
    val bars = Seq(
      ("A", 1L, 100L, 10.0),
      ("A", 3L, 107L, 99.0),
      ("A", 4L, 100L, 10.9),
      ("A", 5L, 100L, 10.0)  // phantom: no trades
    ).toDF("key", "bucket", "b_vol", "b_px")
    val out = Ingest.reconcileFeeds(bars, trades, "key", "bucket",
        "b_vol", "t_vol", "b_px", "t_px", priceTol = 0.5)
      .select("bucket", "lane").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "ok", 2L -> "missing_in_bars",
      3L -> "volume_mismatch", 4L -> "price_mismatch", 5L -> "missing_in_trades"),
      out.toString)
    // grain-uniqueness guard: a duplicate (key, bucket) on either side
    // fails loudly instead of silently double-counting
    val dupBars = bars.unionByName(
      Seq(("A", 1L, 100L, 10.0)).toDF("key", "bucket", "b_vol", "b_px"))
    val e = intercept[Exception] {
      Ingest.reconcileFeeds(dupBars, trades, "key", "bucket",
        "b_vol", "t_vol", "b_px", "t_px", priceTol = 0.5).collect()
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(e).contains("reconcileFeeds bars grain"), chain(e))
    // null-field guard (r15 advice): a PRESENT bar row with a null price
    // must fail loudly, not fall through the mismatch comparison into
    // the 'ok' lane as a silently "agreeing" feed
    val nullBars = Seq(("A", 1L, Some(100L), Option.empty[Double]))
      .toDF("key", "bucket", "b_vol", "b_px")
    val e2 = intercept[Exception] {
      Ingest.reconcileFeeds(nullBars, trades, "key", "bucket",
        "b_vol", "t_vol", "b_px", "t_px", priceTol = 0.5).collect()
    }
    assert(chain(e2).contains("null b_px"), chain(e2))
  }

  test("shapeGate: drifted payloads quarantined raw-intact before parse, shape-exact pass") {
    import spark.implicits._
    val wire = Seq(
      """{"a":1,"b":2}""",       // shape_ok
      """{"a":1,"b":2,"c":3}""", // drifted (unknown c) — would half-parse silently
      """{"a":1}""",             // drifted (missing b)
      """broken"""               // malformed
    ).toDF("value")
    val out = Ingest.shapeGate(wire, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("""{"a":1,"b":2}""") === "shape_ok")
    assert(out("""{"a":1,"b":2,"c":3}""") === "drifted")
    assert(out("""{"a":1}""") === "drifted")
    assert(out("""broken""") === "malformed")
    // raw payload rides the lane column untouched — replayable
    assert(out.keySet.size === 4)
  }

  test("healBars: trades are ground truth — backfill holes, override disagreements, drop phantoms") {
    import spark.implicits._
    val trades = Seq(
      ("A", 1L, 100L, 10.0), // agree -> kept_bar
      ("A", 2L, 100L, 10.0), // bar missing -> backfilled
      ("A", 3L, 100L, 10.0), // bar volume wrong -> overridden
      ("A", 4L, 100L, 10.0)  // bar price stale -> overridden
    ).toDF("key", "bucket", "t_vol", "t_px")
    val bars = Seq(
      ("A", 1L, 100L, 10.0),
      ("A", 3L, 107L, 10.0),
      ("A", 4L, 100L, 10.9),
      ("A", 5L, 33L, 1.0)    // phantom -> dropped
    ).toDF("key", "bucket", "b_vol", "b_px")
    val out = Ingest.healBars(bars, trades, "key", "bucket",
        "b_vol", "t_vol", "b_px", "t_px", priceTol = 0.5)
      .collect().map(r => r.getLong(1) ->
        (r.getString(2), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(out(1L) === ("kept_bar", Some(100L), Some(10.0)))
    assert(out(2L) === ("backfilled", Some(100L), Some(10.0)))
    assert(out(3L) === ("overridden", Some(100L), Some(10.0)),
      "trade volume AND price win on any disagreement")
    assert(out(4L) === ("overridden", Some(100L), Some(10.0)))
    assert(out(5L) === ("dropped_phantom", None, None))
  }
}
