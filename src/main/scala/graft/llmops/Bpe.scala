package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair statistics over a corpus (north-star X11: the inner loop
  * of BPE tokenizer training — count every adjacent character pair,
  * weighted by word frequency; the most frequent pair is the next
  * merge a BPE trainer would perform). One call = one merge-selection
  * round; a trainer iterates by re-invoking over the re-segmented
  * vocabulary.
  *
  * Scale design — the two-level aggregation is the whole trick:
  *   - corpus tokens collapse to the DISTINCT-WORD frame first
  *     (explode + word hash-aggregate with map-side combine — natural
  *     text repeats words heavily, so this shrinks the data by orders
  *     of magnitude before any character work);
  *   - pair generation then runs over the vocabulary, not the corpus:
  *     `transform(sequence(1, len-1), i -> substr(i, 2))` in the array
  *     domain, exploded and summed with the word's count as weight —
  *     the second shuffle is |vocab| x avg word length, independent of
  *     corpus size;
  *   - the top-k is `orderBy.limit` (TakeOrderedAndProject) and the
  *     rank window sorts only the k survivors.
  */
object Bpe {

  /** Top-`k` adjacent character pairs:
    * (rank, pair, freq, n_words) — freq = total corpus occurrences
    * (word-frequency-weighted), n_words = distinct words containing
    * the pair at least once; rank is total (freq desc, pair asc).
    * Overlapping occurrences count separately ("aaa" has "aa" twice),
    * matching the textbook BPE count.
    */
  def pairStats(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val words = graft.util.Partitioning.ensureParallelism(docs)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .filter(length(col("w")) >= 2)
    val top = words
      .select(col("w"), col("wc"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("wc")).as("freq"), count_distinct(col("w")).as("n_words"))
      .orderBy(col("freq").desc, col("pair").asc)
      .limit(k)
    val w = Window.orderBy(col("freq").desc, col("pair").asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("pair"), col("freq"), col("n_words"))
  }
}
