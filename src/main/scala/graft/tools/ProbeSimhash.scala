package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llmops.{Dedup, TextAnalysis}

/** Dev probe: bucket-population + candidate-pair stats for 60-bit vs
  * 120-bit SimHash banding (scale argument for the wide fingerprint).
  */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"docs=${docs.count()}")

    val toks = TextAnalysis.tokens(col("text"))
    // 60-bit / 10-bit-block banding
    val bits = 10
    val h60 = docs.select(col("doc_id"), graft.functions.SimHash64.simhash64(toks).as("sh"))
    val narrow = h60.select(col("doc_id"),
      posexplode(array((0 until 6).map { b =>
        shiftrightunsigned(col("sh"), b * bits).bitwiseAND((1L << bits) - 1)
      }: _*)).as(Seq("block_idx", "block_val")))
    val wide = Dedup.simhash120Blocked(docs, "doc_id", toks, 6)

    for ((name, blocked) <- Seq("narrow60" -> narrow, "wide120" -> wide)) {
      val pops = blocked.groupBy("block_idx", "block_val").count()
      val stats = pops.agg(max("count").as("maxPop"),
        sum((col("count") * (col("count") - 1) / 2).cast("long")).as("candPairs")).collect().head
      println(s"$name maxBucket=${stats.getLong(0)} candidatePairs=${stats.getLong(1)}")
    }
    // exact pair count for reference
    val truePairs = Dedup.simhashNearDupPairs120(docs, "doc_id", toks).count()
    println(s"truePairs(hamming<=5,120bit)=$truePairs")
    val truePairs60 = Dedup.simhashNearDupPairs(docs, "doc_id", toks).count()
    println(s"truePairs(hamming<=5,60bit)=$truePairs60")
    spark.stop()
  }
}
