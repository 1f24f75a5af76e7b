package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document REPEATED-SUBSTRING statistics — the training-data
  * dedup axis X1/X2 do not cover: X1 drops exact-duplicate DOCUMENTS
  * and X2 near-duplicate documents, but a corpus can be document-unique
  * while carrying the same boilerplate PASSAGE thousands of times
  * (licenses, navigation, quote chains), and repeated passages are the
  * memorization vector the substring-dedup literature targets
  * (suffix-array dedup over C4/RealNews — "Deduplicating Training Data
  * Makes Language Models Better", Lee et al. 2022). The Spark-native
  * equivalent of the suffix array is the n-GRAM HASH GROUP-BY below:
  * cheaper than suffixes, same detection power at window granularity.
  *
  * Reference context: the pipeline's corpus axis
  * (`/root/reference/README.md:15` — downstream "financial reports" /
  * document analysis) plus the north-star LLM-pipeline operators
  * (SURVEY §2.10).
  */
object SpanDedup {

  /** Per-document duplicated-span report: every window of `n`
    * consecutive word tokens ([[graft.functions.WordNgrams]] semantics
    * — lowercase, `\s+` split) that also appears in ≥ `minDocs`−1
    * OTHER documents is "duplicated"; duplicated windows overlapping in
    * token space (gap ≤ n−1 positions) merge into maximal SPANS — the
    * unit a substring-dedup pass would cut. Emits one row per document
    * that carries at least one duplicated window: (doc_id, n_grams,
    * n_dup_grams, n_spans, covered_tokens), all exact integers (the
    * oracle needs zero rounding).
    *
    * Scale shape (the X1 discipline): one scan explodes |tokens| gram
    * rows; the duplicated-gram set is ONE hash group-by on the gram
    * (map-side partial on (gram, doc) pairs) — the standard Spark
    * rendering of the suffix-array pass; a LEFT-SEMI join marks the
    * surviving windows (no gram strings carried past the join), and the
    * span merge is one per-document window over the marked positions.
    * Nothing is quadratic in documents or corpus size; the gram
    * group-by shuffle is the honest cost, the same one exact dedup
    * pays.
    */
  def repeatedNgramSpans(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2): DataFrame = {
    require(n >= 2 && n <= 64, s"window must be in [2,64] tokens, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2 (duplication needs another doc), got $minDocs")
    val grams = docs.select(col(idCol).as("doc_id"),
        posexplode(graft.functions.WordNgrams.wordNgrams(col(textCol), n))
          .as(Seq("pos", "gram")))
    val dup = grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select("gram")
    val marked = grams.join(dup, Seq("gram"), "left_semi")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prev = lag(col("pos"), 1).over(w)
    val spans = marked
      // new span when there is no previous duplicated window, or the
      // previous one ends (prev + n - 1) before this one starts
      .withColumn("__brk",
        when(prev.isNull || col("pos") > prev + lit(n - 1), lit(1L)).otherwise(lit(0L)))
      .withColumn("__span", sum(col("__brk")).over(w))
      .groupBy(col("doc_id"), col("__span"))
      .agg(min(col("pos")).as("__lo"), max(col("pos")).as("__hi"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("__hi") - col("__lo") + lit(n)).as("covered_tokens"))
    val totals = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val dupCounts = marked.groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_grams"))
    totals.join(dupCounts, Seq("doc_id"))
      .join(spans, Seq("doc_id"))
      .select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
        col("n_spans"), col("covered_tokens"))
  }
}
