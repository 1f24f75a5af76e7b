package graft.tools

import org.apache.spark.sql.functions._

/** Dev drive: the latent edge cases fixed after code review. */
object DriveEdgeCases {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.llmops.Dedup

    // 1. astral chars: native minhash == HOF minhash on supplementary-plane text
    val astral = Seq((1L, "data 😀 pipeline spark engine rows"),
      (2L, "ascii only text with many interesting words here")).toDF("doc_id", "text")
    val native = astral.select(col("doc_id"),
      graft.functions.MinHashBands.minhashBands(col("text"), 8, 16, 4).as("b"))
    val hof = astral.select(col("doc_id"),
      Dedup.lshBands(Dedup.minhashSignature(
        Dedup.shingleBaseHashes(Dedup.shingles(col("text"), 8)), 16), 4, 4).as("b"))
    println("DRIVE astral native==HOF: " +
      (native.exceptAll(hof).count() == 0 && hof.exceptAll(native).count() == 0))
    val fpN = astral.select(graft.functions.ShingleFingerprint.fingerprint(col("text")).as("f"))
    val fpH = astral.select(graft.llmops.TextAnalysis.fingerprint(col("text")).as("f"))
    println("DRIVE astral fingerprint native==HOF: " + (fpN.exceptAll(fpH).count() == 0))

    // 2. short text: shingles now returns empty array, not garbage
    val short = Seq("ab").toDF("t")
      .select(size(Dedup.shingles(col("t"), 8)).as("n")).collect()(0).getInt(0)
    println(s"DRIVE shingles('ab', k=8) size: $short (expect 0)")

    // 3. bad band count rejected
    val bad = try { graft.functions.MinHashBands(null, 8, 16, 32); "NOT REJECTED" }
      catch { case e: IllegalArgumentException => "rejected: " + e.getMessage.take(60) }
    println(s"DRIVE minhash 16 hashes / 32 bands: $bad")

    // 4. saltedJoin full_outer rejected
    val df = Seq((1, "a")).toDF("k", "v")
    val sj = try { graft.analytics.Skew.saltedJoin(df, df, "k", 4, "full_outer"); "NOT REJECTED" }
      catch { case e: IllegalArgumentException => "rejected: " + e.getMessage.take(60) }
    println(s"DRIVE saltedJoin full_outer: $sj")

    // 5. pivot null-fill: synthesize a user missing event types
    val ev = Seq((1L, "click"), (1L, "view"), (2L, "error")).toDF("user_id", "event_type")
    val piv = ev.groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1))).na.fill(0)
    println("DRIVE pivot with missing combos (expect zeros, no nulls):")
    piv.orderBy("user_id").show(false)
    spark.stop()
  }
}
