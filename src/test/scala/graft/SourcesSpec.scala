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
}
