package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary construction and text→input_ids encoding — the step a
  * training-data pipeline runs between curation and packing: turn each
  * document into the integer id sequence the model trainer consumes
  * (word-level here; the id space is frequency rank, the classic
  * dictionary encoding — a caller with a trained subword vocab supplies
  * its own (token, id) table to [[encodeWithVocab]] and gets the same
  * execution shape).
  *
  * Scale design:
  *   - [[vocabulary]] is the q130 two-level trick: corpus tokens
  *     collapse to the distinct-word frame first (map-side combine),
  *     the top-k is `orderBy.limit` (TakeOrderedAndProject — only k
  *     rows ever reach the driver side of the sort), and the rank
  *     window orders just those k survivors.
  *   - [[encodeWithVocab]] ships the vocabulary INSIDE the plan (the
  *     BloomGate/ADC literal transport) and encodes with
  *     [[graft.functions.VocabEncodeExpr]] — an O(1) hash probe per
  *     token inside whole-stage codegen. The corpus is scanned once,
  *     ZERO shuffle: no explode, no join-back regroup, no window. The
  *     alternative (explode → broadcast-join → re-assemble by (doc,
  *     pos)) shuffles the entire token stream just to rebuild an order
  *     the array already had.
  *   - the vocabulary literal is byte-budgeted (`maxVocabBytes`,
  *     default 16 MB ≈ a 100k-entry subword vocab with long tokens) —
  *     the guard fails loudly with the remedy rather than silently
  *     building a 100 MB task binary.
  */
object Tokenize {

  /** Top-`vocabSize` corpus tokens by frequency: (token, freq,
    * token_id) with token_id = rank (1-based; ties broken by token
    * ascending so the rank is total and engine-portable). Id 0 is
    * deliberately never assigned — it is the conventional OOV/UNK slot
    * [[encodeWithVocab]] maps unknown tokens to.
    */
  def vocabulary(docs: DataFrame, textCol: String, vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    rankTopK(tokenFreqs(docs, textCol), vocabSize)
  }

  /** Full (token, freq) aggregate over the corpus — the one expensive
    * scan [[vocabulary]] and [[coverageCurve]] share.
    */
  private def tokenFreqs(docs: DataFrame, textCol: String): DataFrame =
    graft.util.Partitioning.ensureParallelism(docs)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))

  private def rankTopK(freqs: DataFrame, k: Int): DataFrame = {
    val w = Window.orderBy(col("freq").desc, col("token").asc)
    freqs.orderBy(col("freq").desc, col("token").asc).limit(k)
      .withColumn("token_id", row_number().over(w).cast("long"))
  }

  /** Position-weighted checksum of an id sequence: Σ id×(1-based pos).
    * Order-SENSITIVE (a transposition changes the sum), cheap, and
    * portable — the DuckDB twins state `sum(id * pos)` over the same
    * positions. The content-pinning contract q137 (per doc) and q138
    * (per chunk, summed per bin) share; ONE definition so the two
    * queries cannot drift to different weightings.
    */
  def positionChecksum(ids: Column): Column =
    aggregate(
      zip_with(ids, sequence(lit(1L), size(ids).cast("long")),
        (id, pos) => id * pos),
      lit(0L), (acc, x) => acc + x)

  /** Vocabulary COVERAGE curve — the tokenizer-sizing question: what
    * fraction of all corpus token occurrences do the top-`maxK` vocab
    * entries cover? Returns one row per rank with the running coverage
    * (cumulative frequency / corpus token total, rounded 1e-6), so the
    * caller reads off the k where the curve flattens and sizes
    * [[vocabulary]] (and the OOV rate [[encodeWithVocab]] will pay)
    * from measurement instead of folklore.
    *
    * Scale shape: ONE corpus tokenization. The full (token, freq)
    * aggregate is lazy-checkpointed and serves BOTH consumers — the
    * top-k ranking and the corpus-total denominator (= sum(freq) over
    * the whole vocabulary, a frame orders of magnitude smaller than
    * the corpus) — so the expensive regex tokenization scan runs
    * exactly once (the q127 shared-projection pattern); the rank
    * window orders only the `maxK` survivors.
    */
  def coverageCurve(docs: DataFrame, textCol: String, maxK: Int): DataFrame = {
    val freqs = tokenFreqs(docs, textCol).localCheckpoint(false)
    val top = rankTopK(freqs, maxK)
    val total = freqs.agg(sum(col("freq")).as("total_tokens"))
    val w = Window.orderBy(col("token_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.join(broadcast(total))
      .withColumn("cum_freq", sum(col("freq")).over(w))
      .select(col("token_id").as("rank"), col("token"), col("freq"),
        graft.util.Partitioning.stableRound6(
          col("cum_freq").cast("double") / col("total_tokens").cast("double"))
          .as("coverage"))
  }

  /** Encode `textCol` to an `ids` ARRAY<LONG> column via the (token,
    * token_id) vocabulary frame; tokens outside the vocabulary encode
    * to `oovId` (keep it off the vocabulary's id range — [[vocabulary]]
    * reserves 0). The vocabulary is collected to a plan literal under
    * the `maxVocabBytes` budget; beyond it, shard the corpus or prune
    * the vocab — do NOT raise the budget past executor task-binary
    * comfort (~64 MB).
    */
  def encodeWithVocab(
      docs: DataFrame, textCol: String, vocab: DataFrame,
      oovId: Long = 0L, maxVocabBytes: Long = 16L << 20): DataFrame = {
    val rows = vocab.select(col("token"), col("token_id")).collect()
    var bytes = 0L
    rows.foreach(r => bytes += r.getString(0).getBytes("UTF-8").length + 8L)
    require(bytes <= maxVocabBytes,
      s"vocabulary literal would be $bytes bytes > budget $maxVocabBytes; " +
        "prune the vocabulary (or shard the corpus and encode per shard) " +
        "rather than shipping a larger task binary")
    require(!docs.columns.contains("ids"),
      "docs already has an 'ids' column — encodeWithVocab would silently shadow it")
    val tokens = rows.map(_.getString(0)).toSeq
    val ids = rows.map(_.getLong(1)).toSeq
    require(!ids.contains(oovId),
      s"oovId $oovId collides with an assigned vocabulary id")
    docs.withColumn("ids",
      graft.functions.VocabEncode.encode(
        TextAnalysis.tokens(col(textCol)), tokens, ids, oovId))
  }
}
