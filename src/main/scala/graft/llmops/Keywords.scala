package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Partitioning.stableRound6

/** TF-IDF keyword extraction over a document corpus (north-star X4:
  * corpus-level text analysis that needs global statistics, unlike the
  * per-row operators in [[TextAnalysis]]).
  *
  * Scale design:
  *   - term frequencies: one explode + one (doc, term) hash aggregate —
  *     map-side partial combine soaks up within-document repetition
  *     before the shuffle;
  *   - document frequencies: a `count over (partition by term)` window
  *     on the already-aggregated (doc, term) frame — one shuffle by
  *     term, no second corpus scan and no tf⋈df join;
  *   - corpus size: a single-row aggregate cross-joined in as a
  *     broadcast (never a global window over the term frame);
  *   - top-k per document: row_number over (score desc, term) and
  *     filter — terms are unique per document so the order is total,
  *     no tie-break wobble.
  *
  * Determinism contract for the oracle: idf = ln(N/df) is rounded to
  * 1e-6 BEFORE the tf multiply, and the final score again — both
  * engines then rank on identical doubles.
  */
object Keywords {

  /** Term frequencies: (idCol, term, tf) — whitespace tokens, one row
    * per distinct term per document.
    */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Top-`k` TF-IDF terms per document:
    * (idCol, term, tf, doc_freq, score), score = round6(tf * round6(ln(N/df))).
    * Terms appearing in every document score 0 (ln 1) and naturally sink.
    */
  def tfidfTopTerms(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val n = docs.agg(count(lit(1)).cast("double").as("__n_docs"))
    val tf = termFrequencies(docs, idCol, textCol)
    val byTerm = Window.partitionBy(col("term"))
    val perDoc = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    tf.withColumn("doc_freq", count(lit(1)).over(byTerm))
      .crossJoin(broadcast(n))
      .withColumn("score", stableRound6(col("tf") *
        stableRound6(log(col("__n_docs") / col("doc_freq")))))
      .withColumn("__rk", row_number().over(perDoc))
      .filter(col("__rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("doc_freq"), col("score"))
  }

  /** Zipf rank-frequency profile: the top-`k` tokens with rank,
    * occurrence count, the Zipf invariant rank×count (near-constant on
    * natural text — THE one-glance sanity check that a corpus is
    * language-shaped, not log spam or boilerplate soup), and the
    * cumulative share of all token occurrences covered through each
    * rank (head-heaviness: how much of the corpus the top-k carries).
    *
    * Scale shape: one explode + token hash aggregate (map-side combine
    * soaks repetition), then TakeOrderedAndProject keeps k rows — the
    * rank window sorts ONLY those k, never the vocabulary. The
    * occurrence total comes from a separate sum-of-token-counts scan of
    * the docs (per-row arithmetic, no vocabulary shuffle), NOT from a
    * second consumer of the frequency frame — shared-subplan re-execution
    * would run the explode aggregate twice.
    */
  def zipfProfile(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val top = graft.util.Partitioning.ensureParallelism(docs)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(k)
    val total = docs.agg(
      sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).cast("double").as("__total"))
    val w = Window.orderBy(col("c").desc, col("tok"))
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__cum",
        sum(col("c")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("tok"), col("c"),
        (col("rank") * col("c")).as("rank_x_c"),
        stableRound6(col("__cum").cast("double") / col("__total")).as("cum_frac"))
  }
}
