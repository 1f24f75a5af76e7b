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
  *     broadcast hash join: the 100 TB side is never shuffled. The
  *     broadcast is guarded: if the distinct gram count exceeds
  *     `maxBroadcastGrams` the join falls back to a plain shuffled hash
  *     join instead of OOMing executors;
  *   - per-document n-grams are deduplicated per (doc, gram) BEFORE the
  *     join in the same native gram pass (`wordNgrams(distinct = true)`),
  *     so overlap counts distinct grams without a shuffle;
  *   - only matching (doc_id, gram) pairs — contamination hits, rare by
  *     construction — reach the final count aggregate.
  *
  * Tokenization is [[TextAnalysis.wordNgrams]]'s portable contract
  * (lowercase, `\s+` split, space-joined windows), so the oracle mirrors
  * it with string_split_regex — no JVM hashing in the contract.
  */
object Decontaminate {

  /** Array of space-joined `n`-token shingles of `text` (lowercased,
    * whitespace-tokenized). Documents shorter than `n` tokens yield an
    * empty array. Delegates to the shared native gram builder.
    */
  def ngrams(text: Column, n: Int): Column = TextAnalysis.wordNgrams(text, n)

  /** Distinct n-grams of the benchmark frame: (gram). Kept as a separate
    * step so callers can cache/persist it across corpus partitions.
    */
  def benchmarkGrams(bench: DataFrame, textCol: String, n: Int): DataFrame =
    bench.select(explode(ngrams(col(textCol), n)).as("gram")).distinct()

  /** Per-training-document count of DISTINCT n-grams shared with the
    * benchmark set: (idCol, n_overlap), restricted to docs with at least
    * `minOverlap` shared grams. The benchmark side is broadcast when its
    * distinct gram count is at most `maxBroadcastGrams` (counting it
    * costs one extra pass over the SMALL side only); above that the
    * planner falls back to a shuffled join — slower, but bounded memory.
    *
    * Caller-frame audit (r13 sweep): duplicate-TOLERANT by construction
    * — the benchmark frame is `distinct()`-ed in [[benchmarkGrams]]
    * before the join, and the precomputed-report `decontaminate`
    * overload anti-joins (set semantics); no guard needed on either.
    */
  def contaminationReport(
      corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String,
      n: Int, minOverlap: Long,
      maxBroadcastGrams: Long = 8L * 1000 * 1000): DataFrame = {
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    // pin the benchmark gram set (MB-scale by contract): the broadcast
    // decision needs its count and the probe join needs its rows — an
    // unpinned plan pays the bench-side gram explode TWICE (r17 q121
    // attribution), and at 100 TB the bench side is the one input small
    // enough to materialize by design
    val grams = benchmarkGrams(bench, textCol, n).localCheckpoint(true)
    val benchSide =
      if (grams.count() <= maxBroadcastGrams) broadcast(grams) else grams
    val corpusGrams = corpus
      .select(col(idCol), explode(TextAnalysis.wordNgrams(col(textCol), n, distinct = true)).as("gram"))
    corpusGrams
      .join(benchSide, Seq("gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** The corpus with contaminated documents removed — the shape a
    * training pipeline actually consumes. Left-anti against the report,
    * so clean rows pass through untouched (no wide shuffle: the report
    * is tiny and hash-joined on the id).
    *
    * NOTE: this form scans the corpus twice — once to build the report,
    * once for the anti-join. When the report is already in hand (or
    * several corpora share one benchmark), use the [[decontaminate(
    * corpus:org\.apache\.spark\.sql\.DataFrame,report:org\.apache\.spark\.sql\.DataFrame,idCol:String)* precomputed-report overload]]
    * to pay the corpus scan once.
    */
  def decontaminate(
      corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String,
      n: Int, minOverlap: Long): DataFrame =
    decontaminate(corpus,
      contaminationReport(corpus, bench, idCol, textCol, n, minOverlap), idCol)

  /** Anti-join form over a precomputed contamination report (the output
    * of [[contaminationReport]], possibly persisted) — single corpus
    * scan.
    */
  /** Cross-source containment matrix — the corpus-internal sibling of
    * benchmark decontamination: for each ordered source pair (a, b),
    * what fraction of a's DISTINCT word n-grams also occur in b. The
    * curation diagnostic behind "is src_a a mirror/scrape of src_b" and
    * "which sources actually add novel text" — the pairwise view q106's
    * per-source novelty rate collapses.
    *
    * Scale shape — the corpus is gram-scanned ONCE: the (source, gram)
    * stream hash-aggregates straight to per-gram source SETS (collect_set
    * dedupes map-side, so one gram-keyed shuffle of ~16-byte rows and no
    * separate distinct pass), each set explodes to its ordered pairs
    * INCLUDING self-pairs — at most |sources|² rows per gram — and the
    * (a, a) diagonal of the resulting |sources|²-row matrix IS the
    * per-source distinct-gram total, read back by a window over that
    * tiny frame. No self-join, no second corpus pass for totals, no
    * shared-subplan re-execution (the q41 lesson). Zero-overlap pairs
    * are absent (set co-membership), by contract.
    *
    * Output: (src_a, src_b, n_shared, n_a, containment = n_shared/n_a).
    *
    * Bound: `collect_set(src)` per gram and the per-gram pair explode are
    * O(|sources|) state and O(|sources|²) rows respectively — fine at
    * corpus-mixing source counts (tens), quadratic-per-gram beyond. The
    * guard counts distinct sources up front (one scan of the SMALL
    * src-column projection, cheap next to the gram pass) and fails fast
    * over `maxSources` with the sharding remedy named, in the
    * [[Similarity.lshSizing]] style. Callers that already know the
    * source count (a curated mixture spec, a prior
    * [[contaminationReport]] pass) pass it via `knownSourceCount` and
    * the guard job is skipped entirely — the
    * [[Similarity.lshAutoSizedNeighbors]] precedent for not making a
    * lazy transformation eager.
    *
    * NULL sources: `collect_set` drops nulls, so null-source docs never
    * enter the matrix; the guard count uses `count(DISTINCT src)` (also
    * null-skipping) so both sides agree.
    */
  def sourceOverlapMatrix(
      docs: DataFrame, srcCol: String, textCol: String, n: Int,
      maxSources: Int = 256, knownSourceCount: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nSrc = knownSourceCount.getOrElse(
      docs.agg(count_distinct(col(srcCol))).head().getLong(0))
    require(nSrc <= maxSources,
      f"sourceOverlapMatrix: $nSrc%,d distinct sources exceeds " +
        f"maxSources=$maxSources%,d — per-gram state is O(|sources|) and the " +
        f"pair explode emits up to |sources|²=${nSrc * nSrc}%,d rows PER GRAM. " +
        "For large source counts, shard the gram key (add pmod(gram_key, S) " +
        "to the groupBy and sum the per-shard pair counts) or pre-bucket " +
        "sources into families; or raise maxSources if memory allows.")
    val pairCounts = graft.util.Partitioning.ensureParallelism(docs)
      .select(col(srcCol).as("src"),
        explode(TextAnalysis.wordNgrams(col(textCol), n, distinct = true)).as("gram"))
      .select(col("src"),
        conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long").as("gram_key"))
      .groupBy(col("gram_key")).agg(collect_set(col("src")).as("srcs"))
      .select(explode(col("srcs")).as("src_a"), col("srcs"))
      .select(col("src_a"), explode(col("srcs")).as("src_b"))
      .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("n_shared"))
    val wA = Window.partitionBy(col("src_a"))
    pairCounts
      .withColumn("n_a",
        max(when(col("src_a") === col("src_b"), col("n_shared"))).over(wA))
      .filter(col("src_a") =!= col("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"), col("n_a"),
        graft.util.Partitioning.stableRound6(
          col("n_shared").cast("double") / col("n_a").cast("double")).as("containment"))
  }

  def decontaminate(corpus: DataFrame, report: DataFrame, idCol: String): DataFrame =
    corpus.join(report.select(col(idCol)), Seq(idCol), "left_anti")
}
