package graft.tools

import org.apache.spark.sql.functions._

/** Dev drive: skew utilities over sf0.1 events + GraftSession wiring. */
object DriveSkew {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.analytics.Skew
    import graft.analytics.Skew.SaltedAgg
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.1")
    val salted = Skew.saltedAggregate(ev, Seq(col("event_type")), 16, Seq(
      SaltedAgg.sumOf(col("value"), "total"), SaltedAgg.countAll("n")))
    println("DRIVE salted aggregate (16 buckets):")
    salted.orderBy("event_type").show(false)
    val plain = ev.groupBy("event_type").agg(sum("value").as("total"), count(lit(1)).as("n"))
    val sR = salted.select(col("event_type"), round(col("total"), 4).as("t"), col("n"))
    val pR = plain.select(col("event_type"), round(col("total"), 4).as("t"), col("n"))
    println("DRIVE salted==plain (counts + totals rounded to 4dp): " +
      (sR.exceptAll(pR).count() == 0 && pR.exceptAll(sR).count() == 0))
    val maxDelta = salted.as("s").join(plain.as("p"), "event_type")
      .selectExpr("max(abs(s.total - p.total)) AS d").collect()(0).getDouble(0)
    println(s"DRIVE max |salted - plain| raw double delta: $maxDelta (ULP-order expected)")
    println("DRIVE extensions SQL through GraftSession: ")
    ev.limit(3).selectExpr("event_type").createOrReplaceTempView("drive_ev")
    spark.sql("SELECT shingle_fingerprint(event_type) AS fp FROM drive_ev").show(false)
    spark.stop()
  }
}
