package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora (north-star X-ops;
  * SURVEY §2.10): flag training documents that share long token n-grams
  * with an evaluation/benchmark set, the standard guard against test-set
  * leakage into pretraining data (the GPT-3 paper's 13-gram filter shape).
  *
  * Scale design (100 TB corpus, MB-scale benchmark):
  *   - the benchmark side is exploded to DISTINCT n-grams — for any real
  *     eval suite that is a few million short strings, far under the
  *     broadcast threshold — so the corpus-side probe is a map-side
  *     broadcast hash join: the 100 TB side is never shuffled;
  *   - per-document n-grams are deduplicated per (doc, gram) BEFORE the
  *     join inside the same projection pipeline (array_distinct on the
  *     gram array), so overlap counts distinct grams without a shuffle;
  *   - only matching (doc_id, gram) pairs — contamination hits, rare by
  *     construction — reach the final count aggregate.
  *
  * Tokenization is [[TextAnalysis.tokens]] over lowercased text, so the
  * oracle can mirror it with string_split_regex; grams are space-rejoined
  * token windows (portable — no JVM hashing in the contract).
  */
object Decontaminate {

  /** Array of space-joined `n`-token shingles of `text` (lowercased,
    * whitespace-tokenized). Documents shorter than `n` tokens yield an
    * empty array. The token array is materialized once per row (single
    * HOF pipeline — no repeated interpreted re-evaluation of split).
    */
  def ngrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val toks = TextAnalysis.tokens(lower(text))
    // transform over 0..size-n, each index sliced to an n-token window
    val idxs = when(size(toks) >= n, sequence(lit(0), size(toks) - n))
      .otherwise(array().cast("array<int>"))
    transform(idxs, i => array_join(slice(toks, i + 1, lit(n)), " "))
  }

  /** Distinct n-grams of the benchmark frame: (gram). Kept as a separate
    * step so callers can cache/persist it across corpus partitions.
    */
  def benchmarkGrams(bench: DataFrame, textCol: String, n: Int): DataFrame =
    bench.select(explode(ngrams(col(textCol), n)).as("gram")).distinct()

  /** Per-training-document count of DISTINCT n-grams shared with the
    * benchmark set: (idCol, n_overlap), restricted to docs with at least
    * `minOverlap` shared grams. The benchmark side is broadcast — the
    * corpus side stays map-local until the (rare) matches are counted.
    */
  def contaminationReport(
      corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String,
      n: Int, minOverlap: Long): DataFrame = {
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    val corpusGrams = corpus
      .select(col(idCol), explode(array_distinct(ngrams(col(textCol), n))).as("gram"))
    corpusGrams
      .join(broadcast(benchmarkGrams(bench, textCol, n)), Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** The corpus with contaminated documents removed — the shape a
    * training pipeline actually consumes. Left-anti against the report,
    * so clean rows pass through untouched (no wide shuffle: the report
    * is tiny and hash-joined on the id).
    */
  def decontaminate(
      corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String,
      n: Int, minOverlap: Long): DataFrame =
    corpus.join(
      contaminationReport(corpus, bench, idCol, textCol, n, minOverlap)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
