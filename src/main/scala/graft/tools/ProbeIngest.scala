package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the q51 ingest pipeline. */
object ProbeIngest {
  def time(label: String)(f: => Long): Unit = {
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }
    println(f"STAGE $label: ${runs.map(r => f"${r._1}%.2f").mkString(", ")} (rows=${runs.head._2})")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(100000).selectExpr("sum(id)").collect()

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    time("scan only")(li.count())

    val rep = graft.util.Partitioning.ensureParallelism(li)
    time("repartition")(rep.count())

    val wire = rep.select(to_json(struct(
      array(col("l_returnflag"), col("l_linestatus")).as("c"),
      col("l_extendedprice").as("p"),
      concat(lit("S"), col("l_suppkey")).as("s"),
      unix_millis(col("l_shipdate").cast("timestamp")).as("t"),
      col("l_linenumber").as("v"))).as("value"))
    time("to_json")(wire.count())
    time("to_json+len")(wire.select(length(col("value"))).agg(sum("length(value)")).count())

    val parsed = graft.ingest.Ingest.normalizeTrades(wire)
    time("normalize (from_json)")(parsed.count())

    val gated = graft.ingest.Ingest.gateTrades(parsed)
    time("gate")(gated.count())

    time("full q51")(graft.SparkEntry.queries("q51_ingest_trades")(spark, dir).count())
    spark.stop()
  }
}
