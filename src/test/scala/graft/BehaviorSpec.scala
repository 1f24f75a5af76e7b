package graft

import org.apache.spark.sql.functions._

import graft.analytics.Behavior

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, u: Long, typ: String, ts: String) =
    (id, u, typ, java.sql.Timestamp.valueOf(ts))

  test("funnel: purchases match the latest preceding view; unmatched counted") {
    val events = Seq(
      ev(1, 1, "view", "2024-01-01 10:00:00"),
      ev(2, 1, "view", "2024-01-01 10:30:00"),
      ev(3, 1, "purchase", "2024-01-01 10:40:00"),  // -> view at 10:30, 600s
      ev(4, 2, "purchase", "2024-01-01 09:00:00")   // no view before -> unconverted
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Behavior.funnel(events, "user_id", "ts", "event_type", "view", "purchase")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_convert") === 1)
    assert(out(1L).getAs[Long]("n_converted") === 1)
    assert(out(1L).getAs[Double]("avg_latency_s") === 600.0)
    assert(out(2L).getAs[Long]("n_converted") === 0)
    assert(out(2L).isNullAt(out(2L).fieldIndex("avg_latency_s")))
  }

  test("cohortRetention: offsets count users active N days after first touch") {
    val events = Seq(
      ev(1, 1, "view", "2024-01-01 10:00:00"),
      ev(2, 1, "view", "2024-01-03 10:00:00"),   // day 2 for cohort 01-01
      ev(3, 2, "view", "2024-01-01 12:00:00"),
      ev(4, 3, "view", "2024-01-02 12:00:00")
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Behavior.cohortRetention(events, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(out(("2024-01-01", 0)) === 2)   // users 1 and 2 on day 0
    assert(out(("2024-01-01", 2)) === 1)   // user 1 returns on day 2
    assert(out(("2024-01-02", 0)) === 1)   // user 3's own cohort
    assert(out.size === 3)
  }

  test("typeTwoHistory compresses runs and chains validity ranges") {
    val events = Seq(
      ev(1, 1, "a", "2024-01-01 10:00:00"),
      ev(2, 1, "a", "2024-01-01 11:00:00"),   // same attr -> folded into run 1
      ev(3, 1, "b", "2024-01-01 12:00:00"),   // change
      ev(4, 1, "a", "2024-01-01 13:00:00"),   // change back -> NEW run, not merged
      ev(5, 2, "x", "2024-01-01 09:00:00")
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.analytics.Behavior.typeTwoHistory(
        events, "user_id", "ts", "event_id", col("event_type"), "attr")
      .orderBy("user_id", "valid_from").collect()
    assert(out.length === 4)                        // runs: a, b, a | x
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq === Seq("a", "b", "a"))
    // ranges chain: each valid_to equals the next valid_from
    assert(u1(0).getTimestamp(3) === u1(1).getTimestamp(2))
    assert(u1(1).getTimestamp(3) === u1(2).getTimestamp(2))
    assert(u1(2).isNullAt(3) && u1(2).getInt(4) === 1)   // open current run
    assert(u1(0).getInt(4) === 0)
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length === 1 && u2(0).getInt(4) === 1)
  }

  test("sessionize: gaps over the threshold start new sessions, indexes are 1-based and dense") {
    val events = Seq(
      ev(1, 1, "v", "2024-01-01 10:00:00"),
      ev(2, 1, "v", "2024-01-01 10:10:00"),   // 10 min — same session
      ev(3, 1, "v", "2024-01-01 11:00:00"),   // 50 min — new session
      ev(4, 1, "v", "2024-01-01 11:05:00"),
      ev(5, 2, "v", "2024-01-01 09:00:00")
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.analytics.Behavior.sessionize(events, "user_id", "ts", "event_id",
        gapUs = 1800L * 1000000L)
      .select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === 1 && out(2L) === 1)
    assert(out(3L) === 2 && out(4L) === 2)
    assert(out(5L) === 1)
  }

  test("gapStats: flags only gaps over the threshold and reports the worst") {
    val events = Seq(
      ev(1, 1, "view", "2024-01-01 10:00:00"),
      ev(2, 1, "view", "2024-01-01 10:30:00"),   // 30 min gap — under 1h
      ev(3, 1, "view", "2024-01-01 13:00:00"),   // 2.5 h gap — over
      ev(4, 2, "view", "2024-01-01 09:00:00")    // single event: no gaps
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Behavior.gapStats(events, "user_id", "ts", "event_id", 3600L * 1000000L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_gaps") === 1)
    assert(out(1L).getAs[Long]("max_gap_us") === 2L * 3600L * 1000000L + 1800L * 1000000L)
    assert(out(2L).getAs[Long]("n_gaps") === 0)
    assert(out(2L).isNullAt(out(2L).fieldIndex("max_gap_us")))
    assert(out(1L).getAs[Long]("n_rows") === 3)
  }

  test("rollingDistinctActives: trailing window counts each user once; observed days only") {
    val events = Seq(
      ev(1, 1, "view", "2024-01-01 10:00:00"),
      ev(2, 1, "view", "2024-01-01 11:00:00"),   // same user+day: counted once
      ev(3, 2, "view", "2024-01-03 10:00:00"),
      ev(4, 1, "view", "2024-01-09 10:00:00")    // 8 days later: out of day-1's window
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.analytics.Behavior
      .rollingDistinctActives(events, "user_id", "ts", windowDays = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // observed days only: 01-01, 01-03, 01-09
    assert(out.keySet === Set("2024-01-01", "2024-01-03", "2024-01-09"))
    assert(out("2024-01-01") === 1)   // user 1 (once, despite 2 events)
    assert(out("2024-01-03") === 2)   // users 1 (from 01-01) + 2
    assert(out("2024-01-09") === 2)   // user 1 (09) + user 2 (03 is within 7 days: 03+6=09)
  }

  test("transitionMatrix: per-prev conditional probabilities over lag pairs") {
    val events = Seq(
      ev(1, 1, "a", "2024-01-01 10:00:00"),
      ev(2, 1, "b", "2024-01-01 10:01:00"),   // a->b
      ev(3, 1, "b", "2024-01-01 10:02:00"),   // b->b
      ev(4, 1, "a", "2024-01-01 10:03:00"),   // b->a
      ev(5, 2, "a", "2024-01-01 10:00:00"),
      ev(6, 2, "b", "2024-01-01 10:01:00")    // a->b (user 2; no cross-user pair)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Behavior.transitionMatrix(events, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size === 3)
    assert(out(("a", "b")).getAs[Long]("n") === 2)
    assert(out(("a", "b")).getAs[Double]("prob") === 1.0)  // a is always followed by b
    assert(out(("b", "a")).getAs[Double]("prob") === 0.5)
    assert(out(("b", "b")).getAs[Double]("prob") === 0.5)
    // size===3 above also proves no phantom pair was created from each
    // user's first row (null prev filtered) or across user boundaries
  }

  test("sessionPathTrigrams: trigrams never span a session break; ranked deterministically") {
    val events = Seq(
      ev(1, 1, "a", "2024-01-01 10:00:00"),
      ev(2, 1, "b", "2024-01-01 10:01:00"),
      ev(3, 1, "c", "2024-01-01 10:02:00"),   // a>b>c
      ev(4, 1, "d", "2024-01-01 10:03:00"),   // b>c>d
      ev(5, 1, "a", "2024-01-01 12:00:00"),   // > 30 min gap: new session
      ev(6, 1, "b", "2024-01-01 12:01:00"),
      ev(7, 1, "c", "2024-01-01 12:02:00"),   // a>b>c again — c>d>a / d>a>b must NOT exist
      ev(8, 2, "x", "2024-01-01 10:00:00"),
      ev(9, 2, "y", "2024-01-01 10:01:00")    // only 2 events: no trigram
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Behavior.sessionPathTrigrams(
        events, "user_id", "ts", "event_id", "event_type", gapUs = 1800L * 1000000L, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.head === ("a>b>c", 2L))                    // count-desc first
    assert(out.toMap === Map("a>b>c" -> 2L, "b>c>d" -> 1L))
    assert(!out.map(_._1).exists(p => p.contains("d>a"))) // no cross-session span
  }

  test("seasonalityProfile: bucket t vs overall mean; constant bucket t null") {
    def sr6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val events = Seq(
      // key K: hour 10 has values 1,2,3 (mean 2, sd 1); hour 11 has 8,8
      // (constant -> t null). Overall mean = 22/5 = 4.4
      (1L, "K", "2024-01-01 10:00:00", 1.0),
      (2L, "K", "2024-01-01 10:15:00", 2.0),
      (3L, "K", "2024-01-02 10:30:00", 3.0),
      (4L, "K", "2024-01-01 11:00:00", 8.0),
      (5L, "K", "2024-01-02 11:30:00", 8.0)
    ).toDF("event_id", "k", "ts0", "v")
      .withColumn("ts", to_timestamp(col("ts0")))
    val out = Behavior.seasonalityProfile(events, "k", "ts", "v")
      .collect().map(r => r.getAs[Int]("hour") -> r).toMap
    val h10 = out(10)
    assert(h10.getAs[Long]("n") === 3L && h10.getAs[Double]("mean_h") === 2.0)
    assert(h10.getAs[Double]("t_stat") ===
      sr6((2.0 - 4.4) / (1.0 / math.sqrt(3.0))))
    val h11 = out(11)
    assert(h11.getAs[Double]("mean_h") === 8.0)
    assert(h11.isNullAt(h11.fieldIndex("t_stat"))) // zero variance bucket
  }
}
