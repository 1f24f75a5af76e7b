package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time selected SparkEntry queries (3 runs each). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(100000).selectExpr("sum(id)").collect()
    if (sys.env.contains("GRAFT_CACHE")) { // mirror Bench's warmed cache
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        try {
          val df = spark.read.parquet(s"$dir/$t.parquet")
          df.cache(); df.count()
        } catch {
          case scala.util.control.NonFatal(e) =>
            println(s"[probe] cache warm-up skipped $t: ${e.getMessage}")
        }
      }
    }
    args.foreach { n =>
      if (sys.env.contains("GRAFT_EXPLAIN")) {
        println(s"===== $n =====")
        graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
      } else {
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(n)(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE $n: ${times.map(t => f"$t%.1f").mkString(", ")}")
      }
    }
    spark.stop()
  }
}
