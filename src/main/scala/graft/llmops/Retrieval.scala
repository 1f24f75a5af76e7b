package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Partitioning.stableRound6

/** BM25 lexical retrieval over a document corpus (north-star X8: the
  * scoring half of a training-data retrieval / hard-negative-mining
  * pass — given a bag of query terms, rank the corpus by Okapi BM25).
  *
  * Scale design (the query-term set is tiny and KNOWN; the corpus is
  * the 100 TB side — every choice below keeps per-corpus work one
  * scan and makes the shuffle proportional to matches, not tokens):
  *   - the term filter runs in the ARRAY domain (`filter(tokens, t in
  *     terms)`) BEFORE the generator, so explode emits only query-term
  *     occurrences — at most |docs| x |terms| rows enter the shuffle,
  *     never the corpus token stream;
  *   - document frequency is a `count over (partition by term)` window
  *     on the already-aggregated (doc, term) frame (cardinality <=
  *     matching docs x |terms|), not a second corpus pass;
  *   - the final top-k is a global `orderBy.limit` —
  *     TakeOrderedAndProject, per-partition heaps, no single-partition
  *     window over the corpus; only the k survivors get ranked.
  *
  * Corpus statistics (N, avgdl) come in two forms, mirroring the
  * `resampleFfill` precomputed-bounds precedent:
  *   - the SELF-CONTAINED overloads compute them in-query: the
  *     (id, dl, matched-tokens) projection is lazy-checkpointed so its
  *     two consumers (stats aggregate + tf path) cost ONE corpus scan,
  *     at the price of block-manager residue for the checkpoint's
  *     lifetime (O(|docs|) ids/lengths + matched tokens — far below
  *     corpus size, but pinned until GC; fine for a query, wasteful
  *     inside a hot loop);
  *   - the PRECOMPUTED overloads take (nDocs, avgdl) from the caller —
  *     production keeps corpus stats as index metadata — and run a
  *     single clean scan with NO checkpoint and NO residue. `avgdl`
  *     must already be rounded to 1e-6 (it is re-rounded defensively).
  *
  * Determinism contract for the DuckDB oracle (same discipline as
  * [[Keywords.tfidfTopTerms]]): avgdl, idf, and the tf-normalization
  * are each rounded to 1e-6 as they are produced; the per-(doc, term)
  * score is converted to integer MICROS and per-document totals are
  * summed as longs — float addition order can never wobble a rank.
  *
  * Formula (Lucene-style non-negative idf; k1 = 1.2, b = 0.75):
  *   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   tfn(t,d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
  *   score(d) = sum_t round6(round6(idf) * round6(tfn))
  */
object Retrieval {

  val K1 = 1.2
  val B = 0.75

  /** The (idCol, dl, __qt) projection both scoring paths start from. */
  private def matchedProjection(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String]): DataFrame =
    graft.util.Partitioning.ensureParallelism(docs).select(
      col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("dl"),
      filter(TextAnalysis.tokens(col(textCol)),
        t => t.isin(queryTerms: _*)).as("__qt"))

  /** Shared scoring tail over a frame carrying (idCol, dl, __qt, __n,
    * __avgdl): explode matches, aggregate tf, window df, emit micros.
    */
  private def scoreMatched(withStats: DataFrame, idCol: String): DataFrame = {
    val tf = withStats
      .select(col(idCol), col("dl"), col("__n"), col("__avgdl"),
        explode(col("__qt")).as("term"))
      .groupBy(col(idCol), col("dl"), col("__n"), col("__avgdl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val byTerm = Window.partitionBy(col("term"))
    val idf6 = stableRound6(log(lit(1d) +
      (col("__n") - col("doc_freq") + lit(0.5d)) / (col("doc_freq") + lit(0.5d))))
    val tfn6 = stableRound6(
      col("tf") * lit(K1 + 1d) /
        (col("tf") + lit(K1) * (lit(1d - B) + lit(B) * col("dl") / col("__avgdl"))))
    tf.withColumn("doc_freq", count(lit(1)).over(byTerm))
      .select(col(idCol), col("term"), col("tf"), col("doc_freq"), col("dl"),
        floor(idf6 * tfn6 * lit(1e6) + lit(0.5d)).cast("long").as("score_micros"))
  }

  /** Self-contained per-(document, term) BM25 partials:
    * (idCol, term, tf, doc_freq, dl, score_micros) — score in integer
    * micros (round6 x 1e6). Only documents containing at least one
    * query term appear. Computes corpus stats in-query (see the object
    * doc for the checkpoint trade).
    */
  def bm25TermScores(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val matched = matchedProjection(docs, idCol, textCol, queryTerms)
      .localCheckpoint(false)
    val stats = matched.agg(
      count(lit(1)).cast("double").as("__n"),
      stableRound6(avg(col("dl"))).as("__avgdl"))
    scoreMatched(matched.crossJoin(broadcast(stats)), idCol)
  }

  /** Precomputed-stats form: corpus size and average document length
    * supplied by the caller (index metadata at scale) — single scan,
    * no checkpoint, no block residue.
    */
  def bm25TermScores(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], nDocs: Long, avgdl: Double): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(nDocs > 0, s"nDocs must be positive, got $nDocs")
    require(avgdl > 0, s"avgdl must be positive, got $avgdl")
    scoreMatched(
      matchedProjection(docs, idCol, textCol, queryTerms)
        .withColumn("__n", lit(nDocs.toDouble))
        .withColumn("__avgdl", stableRound6(lit(avgdl))),
      idCol)
  }

  /** Shared top-k tail: per-document long-micros totals, global
    * TakeOrderedAndProject, rank over the k survivors only.
    */
  private def topDocs(termScores: DataFrame, idCol: String, k: Int): DataFrame = {
    val top = termScores
      .groupBy(col(idCol), col("dl"))
      .agg(count(lit(1)).as("n_terms"), sum(col("score_micros")).as("__micros"))
      .orderBy(col("__micros").desc, col(idCol).asc)
      .limit(k)
    val w = Window.orderBy(col("__micros").desc, col(idCol).asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col(idCol), col("n_terms"), col("dl"),
        (col("__micros").cast("double") / lit(1e6)).as("score"))
  }

  /** Top-`k` documents for the query-term bag:
    * (rank, idCol, n_terms, dl, score) — score is the exact long-micros
    * sum rendered back to a double; rank is total (micros desc, id asc)
    * and computed over the k survivors only.
    */
  def bm25TopDocs(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    topDocs(bm25TermScores(docs, idCol, textCol, queryTerms), idCol, k)
  }

  /** Precomputed-stats form of [[bm25TopDocs]] — see the object doc. */
  def bm25TopDocs(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int, nDocs: Long, avgdl: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    topDocs(bm25TermScores(docs, idCol, textCol, queryTerms, nDocs, avgdl), idCol, k)
  }

  /** X101: OFFLINE RETRIEVAL-QUALITY METRICS — the evaluation half the
    * retrieval stack (BM25 X8, ANN X3/X89/X97, hybrid RRF X67) was
    * missing: given a system's RANKING (`qid`, `id`, `rank` ∈ 1..k,
    * unique per query) and a graded TRUTH set (`qid`, `id`, integer
    * `grade` ≥ 0; relevant ⇔ grade > 0), emit per query:
    *
    *   - `recall_k`  = relevant retrieved / relevant total;
    *   - `mrr_k`     = 1 / rank of the first relevant result (0 if none);
    *   - `ndcg_k`    = DCG / ideal DCG with DCG = Σ grade / ln(rank+1)
    *                   (the ln-denominator DCG variant — rank 1 term is
    *                   grade/ln 2);
    *   - `n_rel`, `n_hits` for the audit trail.
    *
    * Determinism contract (the q127 BM25 discipline): every DCG term is
    * one integer grade divided by ln of a small integer — identical
    * IEEE in both engines (the q146 surprisal precedent) — then
    * quantized to integer MICROS before summation, so per-query DCG
    * and ideal-DCG are exact longs and each metric is ONE final
    * correctly-rounded division (sr6). Ideal DCG places the truth
    * grades in descending order (ties don't affect the value), so no
    * tie-break leaks into the number.
    *
    * Scale shape: one equi-join of ranking against truth on (qid, id)
    * — both eval-sized frames, never the corpus — one rank window over
    * the per-query truth (partitioned by qid), and one hash aggregate
    * per side. Caller-frame contracts fail loudly in-plan
    * ([[graft.util.Guards.requireUniquePerKey]]): duplicate (qid, id)
    * in either frame or a duplicated (qid, rank) would silently
    * inflate every metric.
    */
  def rankingMetrics(
      ranking: DataFrame, truth: DataFrame,
      qidCol: String, idCol: String, rankCol: String, gradeCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import graft.util.Partitioning.{stableRound6 => sr6}
    def micros(c: Column): Column = floor(c * 1000000d + 0.5d).cast("long")
    // rank domain guard (r16 advice): rank 0 would divide grade by
    // ln(1) = 0 — an Infinity that silently saturates the micros cast
    // and corrupts DCG instead of failing like the other frame-contract
    // violations; negative ranks feed ln of a value <= 0. Loud, in-plan.
    val rankGuarded = when(
      col(rankCol).cast("long").isNull || col(rankCol).cast("long") < 1L,
      raise_error(concat(lit("rankingMetrics ranking: rank must be a long >= 1, got "),
        coalesce(col(rankCol).cast("string"), lit("NULL")),
        lit(" for id "), col(idCol).cast("string"))))
      .otherwise(col(rankCol).cast("long"))
    val r = graft.util.Guards.requireUniquePerKey(
      graft.util.Guards.requireUniquePerKey(
        ranking.select(col(qidCol).as("qid"), col(idCol).as("id"),
          rankGuarded.as("rank"))
          .filter(col("rank") <= k),
        Seq("qid", "id"), "rankingMetrics ranking (qid, id)"),
      Seq("qid", "rank"), "rankingMetrics ranking (qid, rank)")
    val t = graft.util.Guards.requireUniquePerKey(
      truth.select(col(qidCol).as("qid"), col(idCol).as("id"),
        col(gradeCol).cast("long").as("grade")),
      Seq("qid", "id"), "rankingMetrics truth (qid, id)")
    // retrieved side: grade joined on, null -> 0 (retrieved-irrelevant)
    val joined = r.join(t, Seq("qid", "id"), "left")
      .withColumn("grade", coalesce(col("grade"), lit(0L)))
    val got = joined.groupBy(col("qid")).agg(
      sum(when(col("grade") > 0, 1L).otherwise(0L)).as("n_hits"),
      min(when(col("grade") > 0, col("rank"))).as("__first_rel"),
      sum(micros(col("grade").cast("double") /
        log(col("rank").cast("double") + 1d))).as("__dcg_micros"))
    // ideal side: truth grades in descending order, top k
    val wIdeal = Window.partitionBy(col("qid"))
      .orderBy(col("grade").desc, col("id").asc)
    val ideal = t.filter(col("grade") > 0)
      .withColumn("__irank", row_number().over(wIdeal).cast("long"))
      .groupBy(col("qid")).agg(
        count(lit(1)).as("n_rel"),
        sum(when(col("__irank") <= k,
          micros(col("grade").cast("double") /
            log(col("__irank").cast("double") + 1d))).otherwise(0L))
          .as("__idcg_micros"))
    ideal.join(got, Seq("qid"), "left")
      .select(col("qid"), col("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        sr6(coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_rel").cast("double")).as("recall_k"),
        sr6(coalesce(lit(1.0) / col("__first_rel").cast("double"), lit(0.0)))
          .as("mrr_k"),
        sr6(coalesce(col("__dcg_micros"), lit(0L)).cast("double") /
          col("__idcg_micros").cast("double")).as("ndcg_k"))
  }
}
