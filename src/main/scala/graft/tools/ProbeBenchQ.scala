package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Focused bench probe: run the named queries, in the given order, N
  * times each, printing every observation — used to attribute bench
  * movements to code vs to JVM context from the preceding query (the
  * r5 q42 question). Args: sfDir iters q1 q2 ...
  */
object ProbeBenchQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()
    // mirror Bench's warmed-cache discipline so observations are comparable
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try {
        val df = spark.read.parquet(s"$sfDir/$t.parquet")
        df.cache(); df.count()
      } catch { case _: Throwable => () }
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val times = (0 until iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(s"$n: ${times.map(graft.Bench.f3).mkString(" ")} min=${graft.Bench.f3(times.min)}")
    }
    spark.stop()
  }
}
