package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llmops.{Dedup, Sampling, TextAnalysis}

/** Stage attribution for q121_curation_v2 (r17 judge item 5): where do
  * the ~5.5 s warmed / ~2.6 s cold live? Chain: gopher gate -> keep
  * join -> bloom-gated exact dedup (inc vs hist) -> 5-gram
  * decontamination vs src0 -> temperature mixture -> per-source agg.
  * Cumulative prefixes, 2 iters each, warmed table cache (the
  * ProbeBenchQ discipline).
  */
object ProbeQ121 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    if (!sys.env.contains("PROBE_NO_CACHE")) { docs.cache(); docs.count() }

    def time(tag: String)(f: => Long): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[q121] $tag%-28s min=${ts.map(_._1).min}%.2fs rows=${ts.head._2}")
    }

    val oldSrcs = (0 to 9).map(i => s"src$i")
    def keepIds = TextAnalysis.gopherFilter(docs, "doc_id", "text",
        Seq("the", "a", "and", "of", "to"))
      .filter(col("keep") === 1).select(col("doc_id"))
    def kept = docs.join(keepIds, Seq("doc_id"))
    def hist = kept.filter(col("source").isin(oldSrcs: _*))
    def inc = kept.filter(!col("source").isin(oldSrcs: _*))
    def fresh = Dedup.bloomGatedNewDocs(inc, hist, "text",
      expectedItems = graft.sources.ParquetFooters.tableRowCount(
        spark, s"$dir/documents.parquet"))
    def clean = graft.llmops.Decontaminate.decontaminate(
      fresh, docs.filter(col("source") === "src0"), "doc_id", "text",
      n = 5, minOverlap = 2)
    val tok = TextAnalysis.tokenCount(col("text")).cast("long")
    val w = when(col("source").isin("src10", "src11", "src12"), lit(3.0))
      .otherwise(lit(1.0))

    time("gopher+join (kept)")(kept.count())
    time("hist alone")(hist.count())
    time("bloom fit+gate (fresh)")(fresh.count())
    time("decontaminate (clean)")(clean.count())
    time("mixture+agg (full q121)") {
      Sampling.mixtureSample(clean, "doc_id", "source", tok, w, 0.3)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(tok).as("n_tokens"))
        .count()
    }
    spark.stop()
  }
}
