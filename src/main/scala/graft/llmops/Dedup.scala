package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora (north-star X1/X2;
  * SURVEY §2.10): exact content-hash dedup, MinHash+LSH near-dup, SimHash,
  * and n-gram Jaccard verification.
  *
  * Design for 100 TB:
  *   - Exact dedup is a hash-groupBy on a 256-bit content digest — one
  *     shuffle keyed on the digest, map-side partial aggregation, no
  *     wide rows moving (only digest + doc id).
  *   - MinHash signatures are computed per-row with array expressions
  *     (NO explode, NO shuffle — one whole-stage-codegen pass); only the
  *     banded signature (a few 32-char strings per doc) is shuffled for
  *     candidate generation. Candidate pairs come from a self-equi-join on
  *     (band index, band hash) — a standard shuffled hash join whose keys
  *     are uniformly-distributed hashes, so no skew.
  *   - Hash choice: md5 over seeded shingles. Deliberately portable SQL
  *     (the DuckDB oracle computes the identical signature), deterministic
  *     across runs/partitionings, and uniform enough for banding.
  */
object Dedup {

  /** X1: 256-bit content digest for exact dedup at scale. */
  def contentHash(text: Column): Column = sha2(text, 256)

  /** Character k-shingles of `text` as an array column (1-based positions);
    * empty array for text shorter than k — guarded, because sequence() with
    * an end < start generates a DESCENDING sequence and substr() interprets
    * non-positive positions from the string end, which would yield garbage
    * shingles. Pure per-row expression; no shuffle.
    */
  def shingles(text: Column, k: Int): Column =
    when(length(text) >= k,
      transform(sequence(lit(1), length(text) - (k - 1)), i => text.substr(i, lit(k))))
      .otherwise(array().cast("array<string>"))

  /** Prime modulus for the universal-hash MinHash family. Fits in 31 bits so
    * `a * h` stays under 2^62 — no overflow under ANSI arithmetic, in Spark
    * or the DuckDB oracle.
    */
  val MinhashP: Long = 2147483647L

  /** Deterministic (a, b) coefficients of the i-th permutation
    * `h -> (a*h + b) mod p`. Shared with the oracle SQL generator so both
    * engines compute bit-identical signatures.
    */
  def minhashCoeffs(numHashes: Int): Seq[(Long, Long)] =
    (1 to numHashes).map(i => ((1103515245L * i) % MinhashP, (12345L * i) % MinhashP))

  /** Base 31-bit hash per shingle: md5 computed ONCE per shingle, its first
    * 60 bits parsed as an integer, reduced mod p. All `numHashes`
    * permutations derive from this with two integer ops each — the md5 work
    * does not scale with the signature width (it did in the naive
    * seeded-rehash formulation, 16x the cost at any scale).
    */
  def shingleBaseHashes(shinglesCol: Column): Column =
    transform(shinglesCol, s => conv(substring(md5(s), 1, 15), 16, 10).cast("long") % MinhashP)

  /** Full MinHash signature (array<long> of `numHashes` minima), computed in
    * a SINGLE fold over the base hashes: the accumulator is the vector of
    * current minima, updated element-wise per shingle.
    *
    * Why one fold and not `numHashes` array_min passes: higher-order
    * functions evaluate outside whole-stage codegen, so they get no
    * common-subexpression elimination — an expression referenced N times is
    * COMPUTED N times. With the md5 pass inside, the naive form cost 16x
    * (measured: 44s -> expected ~3s on sf0.1 docs). Keep the whole
    * signature a single expression tree referencing the shingle hashes once.
    */
  def minhashSignature(baseHashes: Column, numHashes: Int): Column = {
    val abs = array(minhashCoeffs(numHashes).map { case (a, b) =>
      struct(lit(a).as("a"), lit(b).as("b"))
    }: _*)
    aggregate(
      baseHashes,
      array(Seq.fill(numHashes)(lit(MinhashP)): _*),
      (acc, h) => zip_with(acc, abs,
        (m, ab) => least(m, (h * ab.getField("a") + ab.getField("b")) % MinhashP)))
  }

  /** LSH bands: the signature split into `numBands` groups of `rowsPerBand`,
    * each band reduced to a single md5 bucket key. Docs sharing any band
    * bucket are near-dup candidates. Single expression tree — `signature`
    * is referenced exactly once (see [[minhashSignature]] on HOF CSE).
    */
  def lshBands(signature: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)), b =>
      md5(array_join(
        transform(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)), _.cast("string")),
        ",")))

  /** X2 end-to-end: candidate near-duplicate pairs by MinHash+LSH banding.
    * Input needs (`idCol` long, `textCol` string); output
    * (doc_a, doc_b, n_shared_bands) with doc_a < doc_b.
    *
    * Only (doc_id, band_idx, band_hash) is shuffled — a few dozen bytes per
    * doc regardless of document size.
    */
  def minhashCandidatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 8, numHashes: Int = 16, numBands: Int = 4): DataFrame = {
    // Native single-pass expression (graft.functions.MinHashBands) — the
    // composable HOF form (shingles/minhashSignature/lshBands above) is
    // semantically identical but evaluates interpreted and ~30x slower.
    val sig = graft.util.Partitioning.ensureParallelism(docs)
      .filter(length(col(textCol)) >= shingleK)
      .select(
        col(idCol).as("doc_id"),
        graft.functions.MinHashBands.minhashBands(
          col(textCol), shingleK, numHashes, numBands).as("bands"))
    val banded = sig.select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** X2 incremental form: near-duplicate candidates of NEW documents
    * against an EXISTING corpus — the every-batch operation of a growing
    * 100 TB corpus (dedup the day's crawl against everything already
    * kept) where re-running the full self-join would redo all historical
    * work. Same banding as [[minhashCandidatePairs]], but the join is
    * new-bands ⋈ old-bands, so cost scales with |new| + matched bands,
    * not |corpus|²; in production the old side's banded signatures are
    * precomputed once and stored (they are 24 bytes/band), making the
    * daily increment a join of a small frame against a bucketed table.
    *
    * Output: (new_id, old_id, n_shared_bands).
    */
  def minhashPairsAgainst(
      newDocs: DataFrame, oldDocs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 8, numHashes: Int = 16, numBands: Int = 4): DataFrame = {
    def banded(docs: DataFrame) =
      graft.util.Partitioning.ensureParallelism(docs)
        .filter(length(col(textCol)) >= shingleK)
        .select(col(idCol).as("doc_id"),
          graft.functions.MinHashBands.minhashBands(
            col(textCol), shingleK, numHashes, numBands).as("bands"))
        .select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    banded(newDocs).as("n")
      .join(banded(oldDocs).as("o"),
        col("n.band_idx") === col("o.band_idx") &&
          col("n.band_hash") === col("o.band_hash"))
      .groupBy(col("n.doc_id").as("new_id"), col("o.doc_id").as("old_id"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Record linkage by blocked fuzzy matching: candidate pairs share a
    * BLOCKING key (equi-join — never an all-pairs scan), then survive an
    * exact edit-distance test. The classic entity-resolution shape
    * (Fellegi-Sunter blocking): the blocking key bounds each block's
    * quadratic cost, the verifier bounds false merges. Block design is
    * the caller's contract — recall is limited to pairs agreeing on the
    * block, exactly like LSH banding bounds MinHash recall.
    *
    * Output: (id_a, id_b, dist) with id_a < id_b, dist <= maxDist.
    */
  def fuzzyMatchPairs(
      records: DataFrame, idCol: String, nameCol: String, blockKey: Column,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val keyed = records.select(
      col(idCol).as("id"), col(nameCol).as("name"), blockKey.as("block"))
    keyed.as("a")
      .join(keyed.as("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        levenshtein(col("a.name"), col("b.name")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** X2 verify stage at scale: exact n-gram Jaccard for candidate pairs.
    * Each doc is reduced ONCE to its sorted distinct shingle-hash array
    * (native [[graft.functions.ShingleHashesSorted]], one codegen'd pass);
    * candidate pairs pick up both arrays via two narrow equi-joins and the
    * intersection is a per-pair O(|A|+|B|) codegen'd merge
    * ([[graft.functions.SortedIntersectCount]]).
    *
    * Shuffle volume is |pairs| rows + one array per doc — NOT the
    * |pairs| x |shingles-per-doc| rows of the explode + double-equi-join
    * form (measured 5.6s -> see bench; the interpreted per-pair
    * array_intersect form was 31s on sf0.1). The 64-bit hash is an equality
    * proxy; the DuckDB oracle computes the identical Jaccard from shingle
    * strings (collision odds ~1e-15 per pair).
    *
    * Output: (doc_a, doc_b, n_shared_bands, jaccard) for candidates with
    * jaccard >= minJaccard.
    */
  def jaccardVerifiedPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 8, numHashes: Int = 16, numBands: Int = 4,
      minJaccard: Double = 0.5): DataFrame = {
    import graft.functions.{ShingleHashesSorted, SortedIntersectCount}
    val pairs = minhashCandidatePairs(docs, idCol, textCol, shingleK, numHashes, numBands)
    val hashed = graft.util.Partitioning.ensureParallelism(docs)
      .filter(length(col(textCol)) >= shingleK)
      .select(col(idCol).as("doc_id"),
        ShingleHashesSorted.shingleHashesSorted(col(textCol), shingleK).as("sh"))
    pairs
      .join(hashed.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(hashed.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared_bands"),
        SortedIntersectCount.sortedIntersectCount(col("sha"), col("shb")).as("inter"),
        size(col("sha")).cast("long").as("na"), size(col("shb")).cast("long").as("nb"))
      .select(col("doc_a"), col("doc_b"), col("n_shared_bands"),
        graft.util.Partitioning.stableRound6(
          col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Asymmetric shingle CONTAINMENT over the LSH candidate set: scores
    * each candidate pair by `|A∩B| / min(|A|,|B|)` — 1.0 when the
    * smaller document's shingles are a subset of the larger's. This is
    * the EXCERPT detector: a quote or partial mirror has high
    * containment but low Jaccard (the symmetric score q37 thresholds
    * on), so near-dup dedup alone keeps both copies of the text.
    *
    * Honest recall contract: candidates still come from MinHash banding,
    * whose per-band agreement probability equals the JACCARD — a tiny
    * excerpt of a huge document can evade banding entirely. Within the
    * candidate set the score is exact (the oracle recomputes it from
    * shingle strings); a dedicated containment index (e.g. bottom-k
    * sketches of the SMALL side probed against the large side's full
    * set) is the scale path when sub-5%-length excerpts matter.
    *
    * Output: (doc_a, doc_b, containment, jaccard) for candidates with
    * containment >= minContainment.
    */
  def containmentVerifiedPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 8, numHashes: Int = 16, numBands: Int = 4,
      minContainment: Double = 0.8): DataFrame = {
    import graft.functions.{ShingleHashesSorted, SortedIntersectCount}
    val pairs = minhashCandidatePairs(docs, idCol, textCol, shingleK, numHashes, numBands)
    val hashed = graft.util.Partitioning.ensureParallelism(docs)
      .filter(length(col(textCol)) >= shingleK)
      .select(col(idCol).as("doc_id"),
        ShingleHashesSorted.shingleHashesSorted(col(textCol), shingleK).as("sh"))
    pairs
      .join(hashed.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(hashed.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        SortedIntersectCount.sortedIntersectCount(col("sha"), col("shb")).as("inter"),
        size(col("sha")).cast("long").as("na"), size(col("shb")).cast("long").as("nb"))
      .select(col("doc_a"), col("doc_b"),
        graft.util.Partitioning.stableRound6(
          col("inter").cast("double") / least(col("na"), col("nb")).cast("double"))
          .as("containment"),
        graft.util.Partitioning.stableRound6(
          col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .filter(col("containment") >= minContainment)
  }

  /** N-gram Jaccard similarity between two shingle-array columns (per-row
    * expression form — fine for ad-hoc pair scoring; use
    * [[jaccardVerifiedPairs]] for bulk candidate verification).
    */
  def jaccard(shinglesA: Column, shinglesB: Column): Column = {
    val da = array_distinct(shinglesA)
    val db = array_distinct(shinglesB)
    val inter = size(array_intersect(da, db)).cast("double")
    inter / (size(da) + size(db) - inter)
  }

  /** X1/X3 crossover: exact embedding-cosine near-duplicate pairs — the
    * verified BASELINE for semantic dedup. Deliberately O(n^2): norms are
    * computed once per vector, the pair loop is a broadcast nested-loop
    * join whose per-pair work is one native codegen'd dot product. The
    * 100 TB path is [[Similarity.lshBucketedNeighbors]] (SRP-bucketed
    * candidates only) or [[Similarity.ivfIndex]] — this operator is what
    * those are validated against, same as brute-force [[Similarity.cosineTopK]]
    * for search.
    *
    * Output: (id_a, id_b, score) with id_a < id_b and rounded
    * score >= minCosine.
    */
  def embeddingNearDupPairs(
      embeddings: DataFrame, idCol: String, vecCol: String,
      minCosine: Double): DataFrame = {
    val base = graft.util.Partitioning.ensureParallelism(embeddings).select(
      col(idCol).as("id"),
      Similarity.asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
    val a = base.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = base.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.util.Partitioning.stableRound6(
          Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("score"))
      .filter(col("score") >= minCosine)
  }

  /** SimHash: 60-bit locality-sensitive fingerprint over token hashes
    * (md5 top 60 bits — portable to the DuckDB oracle, same construction
    * as the MinHash base hash). For each bit position, sum +1/-1 votes
    * from each distinct token's hash bit; the sign vector packs into a
    * long. Composable HOF form of [[graft.functions.SimHash64]] — per-row
    * expression tree, no shuffle; use the native expression in hot paths.
    */
  def simhash64(tokens: Column): Column = {
    val hashes = transform(array_distinct(tokens),
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    val bits = (0 until graft.functions.SimHash64.Bits).map { b =>
      val vote = aggregate(
        hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L) * lit(1L << b)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two simhash fingerprints. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs at scale: the 60-bit fingerprint split into
    * `numBlocks` equal bit-blocks; by pigeonhole any pair within Hamming
    * distance < numBlocks shares at least one identical block, so a
    * block-keyed self-equi-join finds ALL such pairs without the O(n^2)
    * cross join. Output: (doc_a, doc_b, hamming) with hamming <= maxHamming
    * (maxHamming must be < numBlocks for exactness). Oracle-verified
    * against the brute-force pair scan in SQL (q40).
    */
  def simhashNearDupPairs(
      docs: DataFrame, idCol: String, tokensCol: Column,
      maxHamming: Int = 5, numBlocks: Int = 6): DataFrame = {
    require(maxHamming < numBlocks, "pigeonhole exactness needs maxHamming < numBlocks")
    require(graft.functions.SimHash64.Bits % numBlocks == 0,
      s"numBlocks must divide ${graft.functions.SimHash64.Bits}")
    val bits = graft.functions.SimHash64.Bits / numBlocks
    val h = graft.util.Partitioning.ensureParallelism(docs)
      .select(col(idCol).as("doc_id"),
        graft.functions.SimHash64.simhash64(tokensCol).as("sh"))
    val blocked = h.select(col("doc_id"), col("sh"),
      posexplode(array((0 until numBlocks).map { b =>
        shiftrightunsigned(col("sh"), b * bits).bitwiseAND((1L << bits) - 1)
      }: _*)).as(Seq("block_idx", "block_val")))
    val a = blocked.as("a")
    val b = blocked.as("b")
    a.join(b,
        col("a.block_idx") === col("b.block_idx") &&
          col("a.block_val") === col("b.block_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hammingDistance(col("a.sh"), col("b.sh")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Hamming distance between two 120-bit fingerprints (array<long> of
    * two 60-bit words, [[graft.functions.SimHash120]]).
    */
  def hammingDistance120(a: Column, b: Column): Column =
    bit_count(element_at(a, 1).bitwiseXOR(element_at(b, 1))) +
      bit_count(element_at(a, 2).bitwiseXOR(element_at(b, 2)))

  /** The per-doc banded form of the 120-bit fingerprint: (doc_id, sh,
    * block_idx, block_val) rows, one per block. Factored out so callers
    * (and specs) can inspect candidate bucket populations directly.
    */
  /** The per-block extraction of a 120-bit fingerprint column as an
    * array expression (block b = the b-th `120/numBlocks`-bit slice,
    * blocks never straddling the two 60-bit words) — the shared core of
    * [[simhash120Blocked]] and the streaming curation gate's stateless
    * banding ([[graft.streaming.Pipelines.gateOccurrences]]).
    */
  def simhash120BlockArray(sh: Column, numBlocks: Int): Column = {
    import graft.functions.SimHash120
    require(numBlocks % 2 == 0,
      "numBlocks must be even so blocks never straddle the two 60-bit words")
    require(SimHash120.Bits % numBlocks == 0, s"numBlocks must divide ${SimHash120.Bits}")
    val bits = SimHash120.Bits / numBlocks
    val blocksPerWord = numBlocks / 2
    array((0 until numBlocks).map { b =>
      shiftrightunsigned(element_at(sh, b / blocksPerWord + 1),
        (b % blocksPerWord) * bits).bitwiseAND((1L << bits) - 1)
    }: _*)
  }

  def simhash120Blocked(
      docs: DataFrame, idCol: String, tokensCol: Column, numBlocks: Int): DataFrame = {
    import graft.functions.SimHash120
    val h = graft.util.Partitioning.ensureParallelism(docs)
      .select(col(idCol).as("doc_id"), SimHash120.simhash120(tokensCol).as("sh"))
    h.select(col("doc_id"), col("sh"),
      posexplode(simhash120BlockArray(col("sh"), numBlocks))
        .as(Seq("block_idx", "block_val")))
  }

  /** SimHash near-dup pairs at 100 TB scale: the 120-bit fingerprint
    * ([[graft.functions.SimHash120]]) banded into `numBlocks` pigeonhole
    * blocks — with the default 6 blocks each is 20 bits wide (2^20 values),
    * so the expected bucket population is n/2^20 per block and spurious
    * candidate pairs are ~1024x fewer than the 60-bit/10-bit-block form
    * ([[simhashNearDupPairs]]) at the same radius. Still EXACT for
    * Hamming <= maxHamming < numBlocks, and still oracle-verifiable
    * (q40): both hash words are md5 hex-digit ranges DuckDB can parse.
    * Output: (doc_a, doc_b, hamming), hamming measured over all 120 bits.
    */
  def simhashNearDupPairs120(
      docs: DataFrame, idCol: String, tokensCol: Column,
      maxHamming: Int = 5, numBlocks: Int = 6): DataFrame = {
    require(maxHamming < numBlocks, "pigeonhole exactness needs maxHamming < numBlocks")
    val blocked = simhash120Blocked(docs, idCol, tokensCol, numBlocks)
    val a = blocked.as("a")
    val b = blocked.as("b")
    a.join(b,
        col("a.block_idx") === col("b.block_idx") &&
          col("a.block_val") === col("b.block_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hammingDistance120(col("a.sh"), col("b.sh")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Bloom-filter byte budget for `expectedItems` at `fpp` — the standard
    * optimal-bits formula, exposed so callers can size before building.
    */
  def bloomBytes(expectedItems: Long, fpp: Double): Long =
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong / 8 + 1

  /** X1 at increment scale: EXACT "which increment docs are new vs the
    * history corpus", with a Bloom-filter gate cutting the join volume.
    *
    * The gate is an approximate-membership filter over the history's
    * 64-bit content keys: `mightContain = false` is definitive, so those
    * increment rows are new BY CONSTRUCTION and never shuffle; only the
    * might-contain rows (true duplicates + an `fpp` sliver of the new
    * ones) proceed to the exact anti-join on the 256-bit content digest.
    * Output rows are therefore EXACTLY the anti-join's answer — the bloom
    * changes the plan, never the result (the oracle for q109 is the plain
    * exact join).
    *
    * Design for 100 TB: a daily-increment dedup joins |increment| against
    * |history| — the history side is the monster. With the gate, history
    * is read once to BUILD the filter (a treeAggregate of OR-able bit
    * arrays, no shuffle) and once more only for the might-contain rows'
    * anti-join probe — and that join's increment side shrinks from
    * |increment| to ~|dups| + fpp·|new|. At 1% duplicate rate and
    * fpp=0.01, ~98% of the increment never enters an exchange. The
    * increment IS scanned twice (gate-pass + gate-fail branches of the
    * union); a columnar scan is cheap next to the shuffle it avoids.
    *
    * Sizing is guarded like [[Similarity.ivfSizing]]: the filter must fit
    * `maxFilterBytes` (it rides to every task as a reference object), and
    * the guard message names the remedy — shard the gate by key range, or
    * fall back to the plain anti-join whose cost the gate only optimizes.
    * The default budget (128 MB) covers ~10⁸ history docs at fpp=0.01.
    */
  def bloomGatedNewDocs(
      increment: DataFrame, history: DataFrame, textCol: String,
      expectedItems: Long, fpp: Double = 0.01,
      maxFilterBytes: Long = 128L << 20): DataFrame = {
    require(expectedItems > 0,
      s"bloomGatedNewDocs: expectedItems=$expectedItems — size the filter from the " +
        "history count (an empty history needs no gate: the plain anti-join " +
        "is already a no-op there)")
    val bytes = bloomBytes(expectedItems, fpp)
    require(bytes <= maxFilterBytes,
      f"bloomGatedNewDocs: a filter for $expectedItems%,d items at fpp=$fpp " +
        f"needs $bytes%,d bytes > maxFilterBytes=$maxFilterBytes%,d. Shard the " +
        "gate across key ranges (one bloomGatedNewDocs per shard), raise " +
        "maxFilterBytes deliberately with executor memory to match, or use " +
        "the plain exact anti-join the gate optimizes.")
    val filter = history
      .select(xxhash64(col(textCol)).as("__bloom_key"))
      .stat.bloomFilter("__bloom_key", expectedItems, fpp)
    val gate = graft.functions.BloomGate.mightContain(xxhash64(col(textCol)), filter)
    val histDigests = history.select(contentHash(col(textCol)).as("__ch")).distinct()
    val confirmedNew = increment.filter(gate)
      .join(histDigests, contentHash(col(textCol)) === col("__ch"), "left_anti")
    increment.filter(!gate).unionByName(confirmedNew)
  }

  /** X10 (SURVEY §2.10): SemDeDup-style semantic dedup — collapse each
    * transitive cluster of the near-dup pair graph to one canonical
    * representative (min id) and mark every item keep/drop:
    * (idCol, rep_id, kept). Items in no pair are their own
    * representative and always kept.
    *
    * The pair source is a parameter by design: the oracle-verified
    * exact path feeds [[embeddingNearDupPairs]] (all-pairs — fine for
    * a verification slice, quadratic at corpus scale); the 100 TB path
    * feeds the same assignment with LSH/SRP-bucketed candidates
    * ([[minhashCandidatePairs]] or [[graft.functions.SrpBucket]]-banded
    * cosine pairs), which this function never needs to know about.
    *
    * Scale shape: [[Components.connectedComponentsJumping]] over the
    * pairs (propagate + pointer-jump per round — ~1.5x the shuffle of
    * plain min-propagation but O(log diameter) rounds, the right trade
    * for chainy similarity graphs), then ONE
    * left join of the id universe against the component map — the
    * component side holds only ids that appear in a pair (usually a
    * tiny fraction of the corpus), so AQE turns it into a broadcast
    * join in the common case.
    */
  def semanticDedupAssignments(
      items: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    // jumping variant: similarity graphs thread near-dups into long
    // chains (A~B~C~... under a cosine threshold), so round count —
    // O(log diameter) here vs O(diameter) for plain min-propagation —
    // is the dominant cost (measured: composed q129 8.7→5.6 s,
    // docs/BENCH_NOTES.md r10)
    val comp = Components.connectedComponentsJumping(pairs, aCol, bCol)
      .select(col("id").as(idCol), col("label"))
    val rep = coalesce(col("label"), col(idCol))
    items.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol), rep.as("rep_id"), (rep === col(idCol)).as("kept"))
  }
}
