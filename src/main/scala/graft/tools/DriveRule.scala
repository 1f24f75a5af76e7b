package graft.tools

import org.apache.spark.sql.functions._

/** Dev drive: RewriteTopOnePerGroup through the GraftExtensions wiring. */
object DriveRule {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    def latest = graft.ingest.Ingest.dedupFirstBy(Seq("user_id", "event_type"), "event_id")(ev)

    spark.conf.set("spark.graft.rewriteTopOne", "false")
    val off = latest.collect().map(_.toString).toSet
    val planOff = latest.queryExecution.optimizedPlan.toString
    spark.conf.set("spark.graft.rewriteTopOne", "true")
    val on = latest.collect().map(_.toString).toSet
    val planOn = latest.queryExecution.optimizedPlan.toString
    println("DRIVE rule off plan has Window: " + planOff.contains("windowspecdefinition"))
    println("DRIVE rule on  plan has Window: " + planOn.contains("windowspecdefinition") +
      ", has min_by: " + planOn.contains("min_by"))
    println("DRIVE results identical on/off: " + (on == off) + " (" + on.size + " rows)")
    // probe: conf toggles back off without restart
    spark.conf.set("spark.graft.rewriteTopOne", "false")
    println("DRIVE toggled off again, Window back: " +
      latest.queryExecution.optimizedPlan.toString.contains("windowspecdefinition"))
    spark.stop()
  }
}
