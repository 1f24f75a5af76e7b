package graft

import org.apache.spark.sql.functions._

import graft.ingest.Ingest

/** §2.1 source/sink format breadth: the normalized tables round-trip
  * through parquet, ORC, JSON and CSV writers/readers (schema-explicit
  * reads — no inference in the engine).
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val barJson =
    """{"Datetime":"2024-11-15T14:30:00.000Z","Open":224.75,"High":225.1,"Low":224.6,"Close":224.98,"Adj Close":224.98,"Volume":183024,"Dividends":0.0,"Stock Splits":0.0,"ticker":"AAPL"}"""

  test("normalized bars round-trip through parquet/orc/json/csv") {
    val bars = Ingest.normalizeBars(Seq(barJson, barJson.replace("AAPL", "MSFT")).toDF("value"))
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_").toString
    val schema = bars.schema
    // parquet + orc: full fidelity
    for (fmt <- Seq("parquet", "orc")) {
      bars.write.format(fmt).save(s"$dir/$fmt")
      val back = spark.read.format(fmt).load(s"$dir/$fmt")
      assert(back.schema === schema)
      assert(back.exceptAll(bars).count() === 0 && bars.exceptAll(back).count() === 0, fmt)
    }
    // json + csv: schema-explicit read (csv needs timestamp format + no arrays)
    bars.write.json(s"$dir/json")
    val jsonBack = spark.read.schema(schema).json(s"$dir/json")
    assert(jsonBack.exceptAll(bars).count() === 0, "json")
    bars.write.option("header", "true").csv(s"$dir/csv")
    val csvBack = spark.read.schema(schema).option("header", "true").csv(s"$dir/csv")
    assert(csvBack.exceptAll(bars).count() === 0, "csv")
  }

  /** Data-shape contract: the driver has regenerated `/root/testdata`
    * with a different `events.ts` parquet encoding twice (NANOS in the
    * early rounds, TIMESTAMP_MICROS isAdjustedToUTC=0 in round 8). This
    * pins [[Tables.load]]'s normalization for all four shapes a
    * parquet writer could plausibly ship — the three observed plus
    * legacy INT96 (pyarrow `use_deprecated_int96_timestamps`, old
    * Spark/Hive writers), which Spark reads as TimestampType directly —
    * so the next regen fails ONE named test instead of eight anonymous
    * ones.
    */
  test("Tables.load normalizes all four ts parquet encodings to the same TimestampType micros") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts_shapes_").toString
    // NOTE: INT96 carries nanos-of-day + Julian day — microsecond
    // precision round-trips exactly, so the same fixture values serve
    // all four shapes
    val micros = Seq(1704067200000000L, 1704067201500000L, 1704153599999999L)

    // shape 1: legacy long-nanos — what a parquet TIMESTAMP(NANOS) column
    // reads as under spark.sql.legacy.parquet.nanosAsLong (the loader
    // cannot distinguish that from a plain int64-of-nanos, by design)
    micros.map(u => Tuple1(u * 1000L)).toDF("ts")
      .write.parquet(s"$dir/nanos/events.parquet")

    // shapes 2 + 3 need TIMESTAMP_MICROS output; the session is shared
    // across suites, so restore the previous value afterwards
    val prevOut = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      // shape 2: TIMESTAMP_MICROS isAdjustedToUTC=0 → Spark TIMESTAMP_NTZ
      // (the round-8 regen shape)
      micros.map { u =>
        Tuple1(java.time.LocalDateTime.ofEpochSecond(
          u / 1000000L, ((u % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC))
      }.toDF("ts").write.parquet(s"$dir/ntz/events.parquet")

      // shape 3: TIMESTAMP_MICROS isAdjustedToUTC=1 → TimestampType directly
      micros.map { u =>
        Tuple1(java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(u / 1000000L, (u % 1000000L) * 1000L)))
      }.toDF("ts").write.parquet(s"$dir/utc/events.parquet")
      // shape 4: legacy INT96 (the one remaining encoding an older
      // writer could ship) → Spark reads TimestampType directly, the
      // normalizeTs pass-through case — post-1582 values, so the
      // Julian/Gregorian rebase modes cannot bite
      spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      micros.map { u =>
        Tuple1(java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(u / 1000000L, (u % 1000000L) * 1000L)))
      }.toDF("ts").write.parquet(s"$dir/int96/events.parquet")
    } finally prevOut match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }

    for (shape <- Seq("nanos", "ntz", "utc", "int96")) {
      val df = Tables.events(spark, s"$dir/$shape")
      assert(df.schema("ts").dataType === org.apache.spark.sql.types.TimestampType, shape)
      val got = df.select(expr("unix_micros(ts)")).as[Long].collect().sorted.toSeq
      assert(got === micros, shape)
    }
  }

  /** The r10 advice contract: the loader owns the UTC pin — a caller-set
    * non-UTC zone is overwritten (with a WARN) rather than silently
    * shifting NTZ instants, and the pin sticks for the session.
    */
  test("Tables.load pins a non-UTC session time zone back to UTC") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tz_pin_").toString
    Seq(Tuple1(1704067200000000L * 1000L)).toDF("ts")
      .write.parquet(s"$dir/events.parquet")
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val df = Tables.events(spark, dir)
      assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
      // and the value resolves as UTC epoch-micros, not a shifted instant
      assert(df.select(expr("unix_micros(ts)")).as[Long].first() === 1704067200000000L)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
