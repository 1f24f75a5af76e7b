package graft

/** DuckDB oracle SQL — one twin per SparkEntry query (same column names,
  * same rounding, deterministic tie-breaks). The driver materializes each
  * harness parquet table under its bare name (lineitem, orders, ...).
  */
object Oracles {

  /** Shared WITH-clause body computing MinHash+LSH candidate pairs exactly
    * as graft.functions.MinHashBands does (same coefficients, same md5/band
    * derivation) — used by q22 and reused with a Jaccard stage by q37.
    */
  private def minhashPairsCteOver(src: String): String = {
    val p = graft.llmops.Dedup.MinhashP
    val coeffs = graft.llmops.Dedup.minhashCoeffs(16)
    val sigs = coeffs.zipWithIndex.map { case ((a, b), s) =>
      s"list_min(list_transform(hs, h -> (h * $a + $b) % $p)) AS s$s"
    }.mkString(",\n    ")
    val bands = (0 until 4).map { b =>
      val cols = (0 until 4).map(r => s"CAST(s${b * 4 + r} AS VARCHAR)").mkString(", ")
      s"SELECT doc_id, $b AS band_idx, md5(concat_ws(',', $cols)) AS band_hash FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""h AS (
  SELECT doc_id,
    list_transform(range(1, length(text)-6),
      i -> CAST(('0x' || substr(md5(substr(text, i, 8)), 1, 15)) AS BIGINT) % $p) AS hs
  FROM $src WHERE length(text) >= 8
), sig AS (
  SELECT doc_id,
    $sigs
  FROM h
), bands AS (
  $bands
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""
  }

  /** Undirected-closure CTE pair shared by every connected-components
    * oracle (q72/q129/q135/q136): `bi` mirrors the edge list both ways,
    * `reach` is the recursive transitive closure; the caller appends its
    * own `comp` aggregate (min reachable id per node) and naming. ONE
    * definition so a closure fix cannot silently diverge across twins.
    */
  private def closureCtes(src: String, aCol: String, bCol: String): String =
    s"""bi AS (
  SELECT $aCol AS src, $bCol AS dst FROM $src
  UNION ALL SELECT $bCol AS src, $aCol AS dst FROM $src
), reach AS (
  SELECT DISTINCT src AS id, src AS lab FROM bi
  UNION
  SELECT bi.dst AS id, r.lab AS lab FROM reach r JOIN bi ON bi.src = r.id
)"""

  private val minhashPairsCte: String = minhashPairsCteOver("documents")

  /** Suffixed bands-only variant of [[minhashPairsCteOver]] for
    * cross-corpus joins: emits `h_<sfx>`, `sig_<sfx>`, `bands_<sfx>`
    * CTEs over an arbitrary source expression (same coefficients and
    * md5/band construction as the engine's native MinHashBands).
    */
  private def minhashBandsCteOver(sfx: String, src: String): String = {
    val p = graft.llmops.Dedup.MinhashP
    val coeffs = graft.llmops.Dedup.minhashCoeffs(16)
    val sigs = coeffs.zipWithIndex.map { case ((a, b), s) =>
      s"list_min(list_transform(hs, h -> (h * $a + $b) % $p)) AS s$s"
    }.mkString(",\n    ")
    val bands = (0 until 4).map { b =>
      val cols = (0 until 4).map(r => s"CAST(s${b * 4 + r} AS VARCHAR)").mkString(", ")
      s"SELECT doc_id, $b AS band_idx, md5(concat_ws(',', $cols)) AS band_hash FROM sig_$sfx"
    }.mkString("\n  UNION ALL ")
    s"""h_$sfx AS (
  SELECT doc_id,
    list_transform(range(1, length(text)-6),
      i -> CAST(('0x' || substr(md5(substr(text, i, 8)), 1, 15)) AS BIGINT) % $p) AS hs
  FROM $src WHERE length(text) >= 8
), sig_$sfx AS (
  SELECT doc_id,
    $sigs
  FROM h_$sfx
), bands_$sfx AS (
  $bands
)"""
  }

  /** Capstone: the extended curation chain assembled from the SAME
    * verified fragments as q69 (gate/exact/near-drop), q70
    * (decontamination gram contract) and q81 (mixture arithmetic).
    */
  private val q100CurationExtendedSql: String =
    s"""WITH gated AS (
  SELECT * FROM documents WHERE length(text) >= 8
), keepers AS (
  SELECT min(doc_id) AS doc_id FROM gated GROUP BY sha256(text)
), exact AS (
  SELECT g.* FROM gated g JOIN keepers k ON g.doc_id = k.doc_id
), ${minhashPairsCteOver("exact")},
near_kept AS (
  SELECT e.* FROM exact e WHERE e.doc_id NOT IN (SELECT doc_b FROM pairs)
), corpus AS (
  SELECT * FROM near_kept WHERE source <> 'src0'
), ctoks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS t
  FROM corpus
), cgrams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS gram
  FROM ctoks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i) r
), btoks AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS t
  FROM documents WHERE source = 'src0'
), bgrams AS (
  SELECT DISTINCT array_to_string(t[i:i+4], ' ') AS gram
  FROM btoks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i) r
), contaminated AS (
  SELECT c.doc_id FROM cgrams c JOIN bgrams b USING (gram)
  GROUP BY c.doc_id HAVING count(*) >= 2
), clean AS (
  SELECT * FROM corpus WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
), toks2 AS (
  SELECT doc_id, source,
    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS ntok
  FROM clean
), tot AS (
  SELECT source, CAST(sum(ntok) AS BIGINT) AS toks,
    CAST(CASE WHEN source IN ('src1', 'src2', 'src3') THEN 3.0 ELSE 1.0 END AS DOUBLE) AS w
  FROM toks2 GROUP BY source
), rates AS (
  SELECT source,
    CASE WHEN toks = 0 THEN 1.0
         ELSE LEAST(1.0, CAST(0.3 AS DOUBLE) * CAST((SELECT sum(toks) FROM tot) AS DOUBLE) * w
           / CAST((SELECT sum(w) FROM tot) AS DOUBLE) / CAST(toks AS DOUBLE)) END AS rate
  FROM tot
)
SELECT t.source, count(*) AS n_docs, CAST(sum(t.ntok) AS BIGINT) AS n_tokens
FROM toks2 t JOIN rates r ON t.source = r.source
WHERE CAST(('0x' || substr(md5(COALESCE(CAST(t.doc_id AS VARCHAR), chr(0) || 'graft-null-id')), 1, 15)) AS BIGINT)
        / 1152921504606846976.0 < r.rate
GROUP BY t.source"""

  private val oldSrcPred =
    "source IN ('src0','src1','src2','src3','src4','src5','src6','src7','src8','src9')"

  private val q89IncrementalSql: String =
    s"""WITH ${minhashBandsCteOver("o", s"(SELECT * FROM documents WHERE $oldSrcPred)")},
${minhashBandsCteOver("n", s"(SELECT * FROM documents WHERE NOT ($oldSrcPred))")}
SELECT n.doc_id AS new_id, o.doc_id AS old_id, count(*) AS n_shared_bands
FROM bands_n n JOIN bands_o o
  ON n.band_idx = o.band_idx AND n.band_hash = o.band_hash
GROUP BY 1, 2"""

  /** Bounded-horizon EWMA as a single SQL expression over `valueSql`,
    * mirroring `Indicators.ewma` term by term INCLUDING its internal
    * floor-rounding. Weights ride as CAST('<shortest-repr>' AS DOUBLE):
    * string→double parse is correctly rounded in both engines, so ANY
    * alpha is bit-portable (the dyadic-alpha trick of q83 is only needed
    * for bare numeric literals, which DuckDB parses as DECIMAL).
    * Requires a `WINDOW w AS (PARTITION BY ... ORDER BY ...)` clause in
    * the enclosing SELECT.
    */
  private def ewmaSqlExpr(valueSql: String, alpha: Double, horizon: Int): String = {
    val terms = (0 until horizon).map { j =>
      val wj = math.pow(1.0 - alpha, j)
      val x = if (j == 0) valueSql else s"lag($valueSql, $j) OVER w"
      (s"(CASE WHEN $x IS NULL THEN CAST(0.0 AS DOUBLE) ELSE CAST('$wj' AS DOUBLE) * $x END)",
        s"(CASE WHEN $x IS NULL THEN CAST(0.0 AS DOUBLE) ELSE CAST('$wj' AS DOUBLE) END)")
    }
    val num = terms.map(_._1).mkString(" + ")
    val den = terms.map(_._2).mkString(" + ")
    s"""CASE WHEN $valueSql IS NULL THEN NULL
       ELSE floor((($num) / ($den)) * 1000000 + 0.5) / 1000000 END"""
  }

  private val q103MacdSql: String = {
    val wClause = "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
    s"""WITH s1 AS (
  SELECT event_id, user_id, ts, value,
    ${ewmaSqlExpr("value", 2.0 / 13, 16)} AS e12
  FROM events
  $wClause
), s2 AS (
  SELECT event_id, user_id, ts, value, e12,
    ${ewmaSqlExpr("value", 2.0 / 27, 16)} AS e26
  FROM s1
  $wClause
), m AS (
  SELECT event_id, user_id, ts, e12 - e26 AS macd FROM s2
), s3 AS (
  SELECT event_id, user_id, macd,
    ${ewmaSqlExpr("macd", 0.2, 16)} AS signal
  FROM m
  $wClause
)
SELECT event_id, user_id,
  floor(macd * 1000000 + 0.5) / 1000000 AS macd,
  signal,
  floor((macd - signal) * 1000000 + 0.5) / 1000000 AS hist
FROM s3"""
  }

  // one EWMA SQL generator for q83 and q103 — a contract change (null
  // handling, rounding) lands in both oracles or neither. Dyadic 0.5^j
  // weights have exact short decimal renderings, so the string-cast
  // form is value-identical to the bare-CAST form it replaces.
  // fractional differentiation: the weight recursion runs ONCE in
  // driver doubles (Indicators.fracDiffWeights — the same values the
  // Spark plan carries as literals) and lands here via the
  // string-cast parse, so each lag term is bit-identical cross-engine;
  // a null lag (series head) nulls the whole sum in both engines
  private val q149FracDiffSql: String = {
    val terms = graft.analytics.Indicators.fracDiffWeights(0.4, 10).zipWithIndex.map {
      case (wk, k) =>
        val x = if (k == 0) "value" else s"lag(value, $k) OVER w"
        s"CAST('$wk' AS DOUBLE) * $x"
    }.mkString(" + ")
    s"""SELECT event_id, user_id,
  floor(($terms) * 1000000 + 0.5) / 1000000 AS fd
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""
  }

  private val q175CapstoneSql: String = {
    val terms = graft.analytics.Indicators.fracDiffWeights(0.4, 10).zipWithIndex.map {
      case (wk, k) =>
        val x = if (k == 0) "value" else s"lag(value, $k) OVER w"
        s"CAST('$wk' AS DOUBLE) * $x"
    }.mkString(" + ")
    s"""WITH base AS (
  SELECT event_id, user_id, ts, value FROM events WHERE value > 0
), med AS (
  SELECT event_id, user_id, ts, value,
    CASE WHEN len(flt) = 0 THEN NULL
         ELSE (list_sort(flt))[CAST((len(flt) + 1) // 2 AS INT)] END AS med21
  FROM (
    SELECT event_id, user_id, ts, value,
      list_filter(
        list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 20 PRECEDING AND CURRENT ROW),
        x -> x IS NOT NULL) AS flt
    FROM base)
), fdc AS (
  SELECT event_id, user_id, ts, med21,
    floor(($terms) * 1000000 + 0.5) / 1000000 AS fd
  FROM med
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), lab AS (
  SELECT event_id, user_id, ts, med21, fd,
    list(med21) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN 1 FOLLOWING AND 20 FOLLOWING) AS fwd,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS nn
  FROM fdc
), tt AS (
  SELECT event_id, user_id, ts, fd, rn, nn,
    COALESCE(list_position(list_transform(fwd,
      x -> CASE WHEN x >= med21 * 1.25 THEN 1
                WHEN x <= med21 * 0.75 THEN -1 ELSE 0 END), 1), 0) AS p1,
    COALESCE(list_position(list_transform(fwd,
      x -> CASE WHEN x >= med21 * 1.25 THEN 1
                WHEN x <= med21 * 0.75 THEN -1 ELSE 0 END), -1), 0) AS pm
  FROM lab
), ll AS (
  SELECT event_id, user_id, ts, fd, rn,
    CASE WHEN p1 > 0 AND (pm = 0 OR p1 < pm) THEN 1
         WHEN pm > 0 AND (p1 = 0 OR pm < p1) THEN -1
         ELSE 0 END AS label,
    CAST(CASE WHEN p1 > 0 AND (pm = 0 OR p1 < pm) THEN p1
              WHEN pm > 0 AND (p1 = 0 OR pm < p1) THEN pm
              ELSE LEAST(20, nn - rn) END AS BIGINT) AS label_span
  FROM tt
), cov AS (
  SELECT event_id, user_id, ts, fd, rn, label, label_span,
    list(struct_pack(rn := rn, l := label_span)) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS prev
  FROM ll
), cc AS (
  SELECT event_id, user_id, ts, fd, rn, label, label_span,
    CASE WHEN prev IS NULL THEN 0
         ELSE len(list_filter(prev, p -> p.l >= rn - p.rn)) END AS c
  FROM cov
), inv AS (
  SELECT event_id, user_id, ts, fd, label, label_span,
    list(CASE WHEN c = 0 THEN 0.0 ELSE 1.0 / c END) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN 1 FOLLOWING AND 20 FOLLOWING) AS finv
  FROM cc
), u AS (
  SELECT event_id, user_id, ts, fd, label,
    CASE WHEN label_span = 0 THEN NULL
         ELSE floor((list_sum(finv[1:CAST(label_span AS INT)]) / label_span)
                * 1000000 + 0.5) / 1000000 END AS uniq
  FROM inv
), bnd AS (
  SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM base
), f AS (
  SELECT u.label, u.uniq, u.fd,
    CAST(LEAST(floor(CAST(epoch_us(u.ts) - mn AS DOUBLE) * 4
      / CAST(mx - mn + 1 AS DOUBLE)), 3) AS INT) AS fold,
    CAST(LEAST(floor(CAST(epoch_us(u.ts) + 86400000000 - mn AS DOUBLE) * 4
      / CAST(mx - mn + 1 AS DOUBLE)), 3) AS INT) AS fhi,
    CAST(LEAST(floor(CAST(epoch_us(u.ts) - 86400000000 - mn AS DOUBLE) * 4
      / CAST(mx - mn + 1 AS DOUBLE)), 3) AS INT) AS flo
  FROM u, bnd
)
SELECT fold, label, CAST(count(*) AS BIGINT) AS n,
  floor(sum(uniq) * 1000000 + 0.5) / 1000000 AS w_sum,
  floor(avg(fd) * 1000000 + 0.5) / 1000000 AS fd_mean,
  CAST(sum(CASE WHEN fhi > fold AND fold < 3 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_embargo_hi,
  CAST(sum(CASE WHEN flo < fold AND fold > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_embargo_lo
FROM f GROUP BY 1, 2"""
  }

  private val q83EwmaSql: String =
    s"""SELECT event_id, user_id,
  ${ewmaSqlExpr("value", 0.5, 10)} AS ewma
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""

  private val q22MinhashSql: String =
    s"""WITH $minhashPairsCte
SELECT doc_a, doc_b, n_shared_bands FROM pairs"""

  /** Full curation chain in SQL: gate -> exact dedup (keep min doc_id per
    * content hash) -> near-dup removal (drop the higher id of every LSH
    * candidate pair) -> stratified hash sample -> per-lang token stats.
    * Every stage reuses a construction already proven portable by its
    * standalone oracle (q21 sha256, q22 banding, q67 md5-uniform).
    */
  private val q69CurationSql: String =
    s"""WITH gated AS (
  SELECT * FROM documents WHERE length(text) >= 8
), keepers AS (
  SELECT min(doc_id) AS doc_id FROM gated GROUP BY sha256(text)
), exact AS (
  SELECT g.* FROM gated g JOIN keepers k ON g.doc_id = k.doc_id
), ${minhashPairsCteOver("exact")},
near_kept AS (
  SELECT e.* FROM exact e WHERE e.doc_id NOT IN (SELECT doc_b FROM pairs)
), sampled AS (
  SELECT * FROM near_kept
  WHERE CAST(('0x' || substr(md5(COALESCE(CAST(doc_id AS VARCHAR), chr(0) || 'graft-null-id')), 1, 15)) AS BIGINT)
        / 1152921504606846976.0
      < CASE lang WHEN 'en' THEN 0.5 ELSE 1.0 END
)
SELECT lang, count(*) AS n_docs,
  CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0))) AS BIGINT) AS total_tokens
FROM sampled GROUP BY lang"""

  /** Brute-force SimHash oracle: the identical 120-bit md5-based
    * fingerprint (two 60-bit words from hex digits 1-15 and 16-30 per
    * distinct whitespace token, majority vote per bit), then an O(n^2)
    * pair scan on Hamming <= 5 — the banded Spark pipeline (q40) must
    * reproduce it exactly (pigeonhole: any pair within Hamming < 6
    * shares one of six 20-bit blocks).
    */
  private val q40SimhashSql: String = {
    val bits = 60
    def voteBits(hs: String) = (0 until bits).map { b =>
      s"CASE WHEN list_sum(list_transform($hs, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"
    }.mkString(" + ")
    s"""WITH toks AS (
  SELECT doc_id,
    list_distinct(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)) AS ts
  FROM documents
), hashed AS (
  SELECT doc_id,
    list_transform(ts, t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs1,
    list_transform(ts, t -> CAST(('0x' || substr(md5(t), 16, 15)) AS BIGINT)) AS hs2
  FROM toks
), sh AS (
  SELECT doc_id, (${voteBits("hs1")}) AS f1, (${voteBits("hs2")}) AS f2 FROM hashed
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(bit_count(xor(a.f1, b.f1)) + bit_count(xor(a.f2, b.f2)) AS INTEGER) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.f1, b.f1)) + bit_count(xor(a.f2, b.f2)) <= 5"""
  }

  // streaming near-dup marks, batch-twin closure: q40's SimHash-120
  // vote construction + the 6x20-bit banding, then min-predecessor-
  // within-horizon as a grouped self-join — event times are monotone
  // in doc_id (1 s per id, horizon 600 s), so (ts, id) order collapses
  // to doc_id order and the horizon to a 600-id band.
  private val q225NearDupSql: String = {
    val bits = 60
    def voteBits(hs: String) = (0 until bits).map { b =>
      s"CASE WHEN list_sum(list_transform($hs, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"
    }.mkString(" + ")
    s"""WITH toks AS (
  SELECT doc_id,
    list_distinct(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)) AS ts
  FROM documents
), hashed AS (
  SELECT doc_id,
    list_transform(ts, t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs1,
    list_transform(ts, t -> CAST(('0x' || substr(md5(t), 16, 15)) AS BIGINT)) AS hs2
  FROM toks
), sh AS (
  SELECT doc_id, (${voteBits("hs1")}) AS f1, (${voteBits("hs2")}) AS f2 FROM hashed
), blocked AS (
  SELECT doc_id, b.band,
    CASE WHEN b.band < 3 THEN (f1 >> (b.band * 20)) & 1048575
         ELSE (f2 >> ((b.band - 3) * 20)) & 1048575 END AS bv
  FROM sh, (SELECT unnest(range(0, 6)) AS band) b
)
SELECT x.doc_id, CAST(x.band AS INT) AS band, min(y.doc_id) AS dup_of
FROM blocked x JOIN blocked y
  ON x.band = y.band AND x.bv = y.bv
 AND y.doc_id < x.doc_id AND y.doc_id >= x.doc_id - 600
GROUP BY x.doc_id, x.band"""
  }

  // ingestion-time curation gate, batch-twin closure: q225's per-band
  // marks grouped to the per-DOCUMENT verdict — kept iff no band voted
  // dup, canonical predecessor = min band-level dup_of, joined LEFT
  // over the full corpus (clean docs carry zero counts). A batch run
  // never saturates, so n_sat_bands is identically 0.
  private val q226GateSql: String = {
    val bits = 60
    def voteBits(hs: String) = (0 until bits).map { b =>
      s"CASE WHEN list_sum(list_transform($hs, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"
    }.mkString(" + ")
    s"""WITH toks AS (
  SELECT doc_id,
    list_distinct(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)) AS ts
  FROM documents
), hashed AS (
  SELECT doc_id,
    list_transform(ts, t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs1,
    list_transform(ts, t -> CAST(('0x' || substr(md5(t), 16, 15)) AS BIGINT)) AS hs2
  FROM toks
), sh AS (
  SELECT doc_id, (${voteBits("hs1")}) AS f1, (${voteBits("hs2")}) AS f2 FROM hashed
), blocked AS (
  SELECT doc_id, b.band,
    CASE WHEN b.band < 3 THEN (f1 >> (b.band * 20)) & 1048575
         ELSE (f2 >> ((b.band - 3) * 20)) & 1048575 END AS bv
  FROM sh, (SELECT unnest(range(0, 6)) AS band) b
), marks AS (
  SELECT x.doc_id, x.band, min(y.doc_id) AS dup_of
  FROM blocked x JOIN blocked y
    ON x.band = y.band AND x.bv = y.bv
   AND y.doc_id < x.doc_id AND y.doc_id >= x.doc_id - 600
  GROUP BY x.doc_id, x.band
), perdoc AS (
  SELECT doc_id, min(dup_of) AS dup_of, CAST(count(*) AS INT) AS n_dup_bands
  FROM marks GROUP BY doc_id
)
SELECT d.doc_id, p.doc_id IS NULL AS kept, p.dup_of,
  CAST(COALESCE(p.n_dup_bands, 0) AS INT) AS n_dup_bands,
  CAST(0 AS INT) AS n_sat_bands
FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id"""
  }

  // streaming curation chain, batch-twin closure (X99): the q226 gate
  // CTEs composed with exact dedup (first kept doc per content hash —
  // event time is monotone in doc_id, so the (datetime, doc_id) keeper
  // collapses to min(doc_id)) and the shared quality CTE chain at the
  // q131 threshold.
  // lazy: splices qualityPCtes, which is declared later in this object
  private lazy val q240ChainSql: String = {
    val bits = 60
    def voteBits(hs: String) = (0 until bits).map { b =>
      s"CASE WHEN list_sum(list_transform($hs, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"
    }.mkString(" + ")
    s"""WITH toks AS (
  SELECT doc_id,
    list_distinct(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)) AS ts
  FROM documents
), hashed AS (
  SELECT doc_id,
    list_transform(ts, t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hs1,
    list_transform(ts, t -> CAST(('0x' || substr(md5(t), 16, 15)) AS BIGINT)) AS hs2
  FROM toks
), sh AS (
  SELECT doc_id, (${voteBits("hs1")}) AS f1, (${voteBits("hs2")}) AS f2 FROM hashed
), blocked AS (
  SELECT doc_id, b.band,
    CASE WHEN b.band < 3 THEN (f1 >> (b.band * 20)) & 1048575
         ELSE (f2 >> ((b.band - 3) * 20)) & 1048575 END AS bv
  FROM sh, (SELECT unnest(range(0, 6)) AS band) b
), marks AS (
  SELECT x.doc_id, x.band, min(y.doc_id) AS dup_of
  FROM blocked x JOIN blocked y
    ON x.band = y.band AND x.bv = y.bv
   AND y.doc_id < x.doc_id AND y.doc_id >= x.doc_id - 600
  GROUP BY x.doc_id, x.band
), perdoc AS (
  SELECT doc_id FROM marks GROUP BY doc_id
), $qualityPCtes, g AS (
  SELECT d.doc_id, d.text, pd.doc_id IS NULL AS kept
  FROM documents d LEFT JOIN perdoc pd ON d.doc_id = pd.doc_id
), hx AS (
  SELECT doc_id, kept, md5(text) AS h FROM g
), firsts AS (
  SELECT h, min(doc_id) AS keeper FROM hx WHERE kept GROUP BY h
), lanes AS (
  SELECT hx.doc_id,
    CASE WHEN NOT hx.kept THEN 'gate_dropped'
         WHEN hx.doc_id <> f2.keeper THEN 'exact_dup'
         WHEN q.quality_p < 0.5e0 THEN 'low_quality'
         ELSE 'curated' END AS lane,
    q.quality_p
  FROM hx
  LEFT JOIN firsts f2 ON hx.h = f2.h
  JOIN p q ON hx.doc_id = q.doc_id
)
SELECT lane, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(doc_id) AS BIGINT) AS id_sum,
  CAST(sum(CAST(floor(quality_p * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
    AS quality_micros
FROM lanes GROUP BY 1"""
  }

  private val q37JaccardSql: String =
    s"""WITH $minhashPairsCte,
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, length(text)-6), i -> substr(text, i, 8))) AS s
  FROM documents WHERE length(text) >= 8
), scored AS (
  SELECT p.doc_a, p.doc_b, p.n_shared_bands,
    floor((CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
      / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))) * 1000000 + 0.5) / 1000000 AS jaccard
  FROM pairs p
  JOIN sh sa ON p.doc_a = sa.doc_id
  JOIN sh sb ON p.doc_b = sb.doc_id
)
SELECT doc_a, doc_b, n_shared_bands, jaccard FROM scored WHERE jaccard >= 0.5"""

  // shared by q131 (Column API), q134 (SQL scalar surface), and q136's
  // canonical-selection ranking — all entry points must stay
  // oracle-identical by construction. The CTE chain ends in
  // p(doc_id, quality_p) so composites can splice it.
  private val qualityPCtes: String =
    """m AS (
  SELECT doc_id,
    CAST(length(text) AS DOUBLE) AS lc,
    CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS DOUBLE) AS ntok,
    CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) AS np,
    CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0)) AS DOUBLE) AS ltok,
    CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        x -> list_contains(['the','a','and','of','to'], x))) AS DOUBLE) AS sw
  FROM documents
), f AS (
  SELECT doc_id,
    floor(least(lc / 500e0, 1e0) * 1000000 + 0.5) / 1000000 AS f1,
    floor((lc / greatest(ntok, 1e0)) * 1000000 + 0.5) / 1000000 AS f2,
    floor((np / greatest(lc, 1e0)) * 1000000 + 0.5) / 1000000 AS f3,
    floor((sw / greatest(ltok, 1e0)) * 1000000 + 0.5) / 1000000 AS f4
  FROM m
), zt AS (
  SELECT doc_id,
    floor((-1.5e0 + 2e0 * f1 + 0.15e0 * f2 + -4e0 * f3 + 3e0 * f4) * 1000000 + 0.5) / 1000000 AS z
  FROM f
), p AS (
  SELECT doc_id,
    floor((1e0 / (1e0 + exp(-z))) * 1000000 + 0.5) / 1000000 AS quality_p
  FROM zt
)"""

  private val qualityLogisticSql: String =
    s"""WITH $qualityPCtes
SELECT doc_id, quality_p,
  CAST(least(floor(quality_p * 10), 9) AS INTEGER) AS decile,
  quality_p >= 0.5e0 AS keep
FROM p"""

  /** Vocabulary + encode CTE chain shared by q137/q138/q139: tokenized
    * corpus (`tk`), nonempty docs with counts (`nz`), positional token
    * stream (`un`, q132's unnest(range) pattern), top-`k` vocabulary
    * (`vc` — freq desc, token asc: total), ranked ids (`v`, id 0
    * reserved for OOV), and the encoded stream (`enc`). ONE definition
    * so a vocab tie-break or OOV change cannot diverge across twins;
    * callers not referencing a CTE (q139 never reads `enc`) pay
    * nothing — unreferenced CTEs are not executed.
    */
  private def vocabEncCtes(k: Int): String =
    s"""tk AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS toks
  FROM documents
), nz AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS tc FROM tk WHERE len(toks) >= 1
), un AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[i] AS t
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM nz)
), vc AS (
  SELECT t AS token, count(*) AS freq FROM un GROUP BY 1
  ORDER BY freq DESC, token LIMIT $k
), v AS (
  SELECT token, freq, row_number() OVER (ORDER BY freq DESC, token) AS token_id FROM vc
), enc AS (
  SELECT un.doc_id, un.pos, CAST(coalesce(v.token_id, 0) AS BIGINT) AS id
  FROM un LEFT JOIN v ON un.t = v.token
)"""

  val sql: Map[String, String] = Map(
    // ---- r7 bounded-error companions for the approximate operators ----
    // Each approximate query emits exact-side facts plus verdict booleans
    // computed in-plan (|approx-exact| within tolerance / recall >= tau);
    // the oracle recomputes the exact side and predicts `true` — the row
    // hash-matches iff the approximation honors its advertised bound.

    "q28_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact, true AS approx_ok
FROM events GROUP BY event_type""",

    "q58_approx_percentiles" ->
      """SELECT event_type,
  floor((quantile_cont(value, 0.5)) * 1000000 + 0.5) / 1000000 AS p50,
  floor((quantile_cont(value, 0.99)) * 1000000 + 0.5) / 1000000 AS p99,
  true AS p50_ok, true AS p99_ok
FROM events GROUP BY event_type""",

    "q41_lsh_neighbors" ->
      """WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings),
pairs AS (
  SELECT id_a, id_b, score FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      floor((list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm)) * 1000000 + 0.5) / 1000000 AS score
    FROM e a JOIN e b ON a.vec_id < b.vec_id)
  WHERE score >= 0.4)
SELECT count(*) AS n_exact_pairs, true AS recall_ok, true AS precision_ok
FROM pairs""",

    "q43_ivf_knn" ->
      """WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
top AS (
  SELECT vec_id FROM (
    SELECT e.vec_id,
      list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.qe[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform(qv.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS score
    FROM embeddings e, qv
    WHERE e.vec_id <> 0)
  ORDER BY score DESC, vec_id
  LIMIT 10)
SELECT CAST(0 AS BIGINT) AS qid, count(*) AS n_exact_top, true AS recall_ok
FROM top""",

    "q66_ivf_batch" ->
      """WITH qv AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT qv.qid, e.vec_id AS id,
    round(
      list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.qe[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform(qv.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS score
  FROM embeddings e, qv
  WHERE e.vec_id <> qv.qid
),
top AS (
  SELECT qid, id FROM (
    SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rn
    FROM scored) WHERE rn <= 10)
SELECT count(DISTINCT qid) AS n_queries, count(*) AS n_exact, true AS recall_ok
FROM top""",

    // PQ + re-rank: same exact-twin verdict construction as q66 — the
    // oracle recomputes the exact side and predicts the measured-margin
    // recall gate as a literal
    "q112_pq_knn" ->
      """WITH qv AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT qv.qid, e.vec_id AS id,
    round(
      list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.qe[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform(qv.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS score
  FROM embeddings e, qv
  WHERE e.vec_id <> qv.qid
),
top AS (
  SELECT qid, id FROM (
    SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rn
    FROM scored) WHERE rn <= 10)
SELECT count(DISTINCT qid) AS n_queries, count(*) AS n_exact, true AS recall_ok
FROM top""",

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  floor((avg(l_quantity)) * 1000000 + 0.5) / 1000000 AS avg_qty,
  floor((avg(l_extendedprice)) * 1000000 + 0.5) / 1000000 AS avg_price,
  floor((avg(l_discount)) * 1000000 + 0.5) / 1000000 AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1997-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
  round(l_extendedprice * (1 - l_discount), 4) AS net_price,
  upper(l_linestatus) AS status
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'R'""",

    "q03_join_revenue" ->
      """SELECT c_mktsegment,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  count(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment""",

    "q04_dim_broadcast_join" ->
      """SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name""",

    "q05_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""",

    "q06_anti_join" ->
      """SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",

    "q07_topn_per_group" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3""",

    "q08_moving_avg" ->
      """SELECT event_id, user_id,
  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS ma5
FROM events""",

    "q09_lag_returns" ->
      """SELECT event_id, user_id,
  floor((value / nullif(lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0) - 1) * 1000000 + 0.5) / 1000000 AS ret
FROM events""",

    "q10_running_sum" ->
      """SELECT event_id, user_id,
  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
FROM events""",

    "q11_dedup_first" ->
      """SELECT user_id, event_type, event_id, round(value, 4) AS value
FROM (
  SELECT user_id, event_type, event_id, value,
    row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
  FROM events
) WHERE rn = 1""",

    "q12_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)""",

    "q13_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)""",

    "q14_distinct_counts" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events
GROUP BY event_type""",

    "q15_set_ops" ->
      """WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
viewers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
SELECT user_id, 'both' AS cohort FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM viewers)
UNION ALL
SELECT user_id, 'buy_only' AS cohort FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM viewers)
UNION ALL
SELECT user_id, 'view_only' AS cohort FROM (SELECT user_id FROM viewers EXCEPT SELECT user_id FROM buyers)""",

    "q16_sort_limit" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20""",

    "q17_candles_5m" ->
      """SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
  round(arg_min(value, event_id), 4) AS open,
  round(max(value), 4) AS high,
  round(min(value), 4) AS low,
  round(arg_max(value, event_id), 4) AS close,
  round(sum(value), 4) AS vsum,
  count(*) AS n
FROM events
GROUP BY event_type, time_bucket(INTERVAL '5 minutes', ts)""",

    "q18_vwap" ->
      """SELECT l_partkey,
  floor((sum(l_extendedprice * l_quantity) / sum(l_quantity)) * 1000000 + 0.5) / 1000000 AS vwap,
  round(sum(l_quantity), 2) AS total_qty
FROM lineitem
GROUP BY l_partkey""",

    "q19_asof_join" ->
      """SELECT p.event_id, p.user_id, p.ts, round(p.value, 4) AS value,
  v.ts AS view_ts, round(v.value, 4) AS view_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts""",

    // oracle over the RAW events table: directory pruning on the
    // partitioned copy must be a pure optimization
    "q63_partitioned_scan" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date, event_type,
  count(*) AS n, round(sum(value), 2) AS total
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
GROUP BY 1, 2""",

    "q69_corpus_curation" -> q69CurationSql,

    // connected components over the q22 pair list: recursive closure
    // (min reachable id per node) must equal the engine's min-label
    // propagation fixpoint
    "q72_dedup_groups" ->
      s"""WITH RECURSIVE $minhashPairsCte,
${closureCtes("pairs", "doc_a", "doc_b")}, comp AS (
  SELECT id AS doc_id, min(lab) AS component FROM reach GROUP BY id
)
SELECT doc_id, component, count(*) OVER (PARTITION BY component) AS n_members FROM comp""",

    // dedup yield telemetry: q72's pair graph + closure -> cluster-size
    // distribution; singletons (docs in no pair) appear as size 1;
    // n_dropped = what keep-one-per-cluster would cut
    "q192_dedup_yield" ->
      s"""WITH RECURSIVE $minhashPairsCte,
${closureCtes("pairs", "doc_a", "doc_b")}, comp AS (
  SELECT id, min(lab) AS component FROM reach GROUP BY id
), sizes AS (
  SELECT component, CAST(count(*) AS BIGINT) AS cluster_size FROM comp GROUP BY 1
), dist AS (
  SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters FROM sizes GROUP BY 1
  UNION ALL
  SELECT CAST(1 AS BIGINT) AS cluster_size,
    CAST((SELECT count(*) FROM documents) - (SELECT count(*) FROM comp) AS BIGINT) AS n_clusters
)
SELECT cluster_size, n_clusters,
  cluster_size * n_clusters AS n_docs,
  (cluster_size - 1) * n_clusters AS n_dropped
FROM dist""",

    // TF-IDF: df via count-over-term window on the (doc, term) frame,
    // idf rounded to 1e-6 before the tf multiply (both engines rank on
    // identical doubles), row_number is total (term unique per doc)
    "q73_tfidf_terms" ->
      """WITH tf AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id,
          unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS t
        FROM documents)
  GROUP BY 1, 2
), w AS (
  SELECT doc_id, term, tf, count(*) OVER (PARTITION BY term) AS doc_freq FROM tf
), n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT doc_id, term, tf, doc_freq,
    floor(tf * (floor(ln(n.n / doc_freq) * 1000000 + 0.5) / 1000000) * 1000000 + 0.5) / 1000000 AS score
  FROM w CROSS JOIN n
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk FROM scored
)
SELECT doc_id, term, tf, doc_freq, score FROM ranked WHERE rk <= 3""",

    // per-label centroids: per-dim means rounded to 1e-6, then an
    // in-order fold for the norm (list built ORDER BY dim = Spark's
    // ascending native dot loop)
    "q74_label_centroids" ->
      """WITH per AS (
  SELECT label, i,
    floor(avg(CAST(embedding[i] AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS m,
    count(*) AS n
  FROM embeddings, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) r
  GROUP BY 1, 2
), asm AS (
  SELECT label, max(n) AS n_vectors, CAST(count(*) AS INTEGER) AS n_dims,
    list(m ORDER BY i) AS ms
  FROM per GROUP BY 1
)
SELECT label, n_vectors, n_dims,
  floor(sqrt(list_sum(list_transform(ms, x -> x * x))) * 1000000 + 0.5) / 1000000 AS centroid_norm
FROM asm""",

    // exact-k per stratum: rank by the same md5-uniform double (not the
    // raw 60-bit int — both engines must fall to the doc_id tie-break at
    // identical collision points), keep 25 per lang
    "q75_exact_stratum_sample" ->
      """WITH ranked AS (
  SELECT doc_id, lang, row_number() OVER (
    PARTITION BY lang
    ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
               / 1152921504606846976.0,
             doc_id) AS rk
  FROM documents
)
SELECT doc_id, lang FROM ranked WHERE rk <= 25""",

    // Gopher repetition stats: the oracle rebuilds the per-doc 2-gram
    // multiset by explode+count (the engine's per-row sorted-run fold
    // must match it exactly); same rounding association as the engine
    "q71_repetition_stats" ->
      """WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
  FROM documents
), grams AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) r
), counts AS (
  SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2
)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
  floor(CAST(max(c) AS DOUBLE) / sum(c) * 1000000 + 0.5) / 1000000 AS top_gram_frac,
  floor(CAST(COALESCE(sum(c) FILTER (WHERE c > 1), 0) AS DOUBLE) / sum(c) * 1000000 + 0.5) / 1000000 AS dup_gram_frac
FROM counts GROUP BY doc_id""",

    // decontamination: distinct 5-gram overlap between each training doc
    // (source <> src0) and the benchmark gram set (source = src0); the
    // oracle mirrors the engine's lowercase whitespace tokenization
    "q70_decontaminate" ->
      """WITH toks AS (
  SELECT doc_id, source,
    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
  FROM documents
), grams AS (
  SELECT doc_id, source, array_to_string(t[i:i+4], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i) r
), bench AS (SELECT DISTINCT gram FROM grams WHERE source = 'src0'),
train AS (SELECT DISTINCT doc_id, gram FROM grams WHERE source <> 'src0')
SELECT t.doc_id, count(*) AS n_overlap
FROM train t JOIN bench b USING (gram)
GROUP BY t.doc_id HAVING count(*) >= 2""",

    // deterministic cumulative packing: the oracle's window cumsum must
    // reproduce the engine's bin layout exactly
    "q68_sequence_packing" ->
      """WITH toks AS (
  SELECT doc_id, doc_id % 8 AS shard,
    CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS tokens
  FROM documents
), binned AS (
  SELECT shard, tokens,
    CAST(floor((sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens) / 512.0) AS BIGINT) AS bin
  FROM toks
)
SELECT shard, bin, count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS bin_tokens
FROM binned GROUP BY shard, bin""",

    // deterministic hash sampling: DuckDB recomputes the md5-uniform and
    // the per-stratum threshold row by row — membership must be identical
    "q67_stratified_sample" ->
      """WITH sampled AS (
  SELECT * FROM events
  WHERE CAST(('0x' || substr(md5(COALESCE(CAST(event_id AS VARCHAR), chr(0) || 'graft-null-id')), 1, 15)) AS BIGINT)
        / 1152921504606846976.0
      < CASE event_type WHEN 'view' THEN 0.25 WHEN 'click' THEN 0.5 ELSE 1.0 END
)
SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
FROM sampled GROUP BY event_type""",

    // batched exact kNN: the bounded-heap aggregate must pick the same
    // rows as the window-rank form (score DESC, id tie-break)
    "q65_knn_batch" ->
      """WITH qv AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT qv.qid, e.vec_id AS id,
    round(
      list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.qe[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform(qv.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS score
  FROM embeddings e, qv
  WHERE e.vec_id <> qv.qid
)
SELECT qid, id, score FROM (
  SELECT qid, id, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rn
  FROM scored) WHERE rn <= 10""",

    // the skew-safe (key, time-bucket) as-of plan must reproduce the
    // plain ASOF result exactly
    "q64_asof_bucketed" ->
      """SELECT p.event_id, p.user_id, p.ts, round(p.value, 4) AS value,
  v.ts AS view_ts, round(v.value, 4) AS view_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts""",

    // oracle is plain SQL over the SOURCE table — matches only if the tx
    // upsert replaced every wrong appended row exactly once
    "q62_tx_roundtrip" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, count(*) AS n,
  round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY 1""",

    // oracle is the PLAIN group-by: the salted two-phase plan must be
    // result-identical (sum_qty is integer-valued in double -> exact)
    "q61_salted_agg" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n,
  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag""",

    "q60_embed_near_dups" ->
      """WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings)
SELECT id_a, id_b, score FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    floor((list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm)) * 1000000 + 0.5) / 1000000 AS score
  FROM e a JOIN e b ON a.vec_id < b.vec_id)
WHERE score >= 0.4""",

    // same oracle as q19 — q59 is the identical query through the custom
    // sort-merge as-of physical operator
    "q59_asof_merge" ->
      """SELECT p.event_id, p.user_id, p.ts, round(p.value, 4) AS value,
  v.ts AS view_ts, round(v.value, 4) AS view_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts""",

    "q20_json_props" ->
      """SELECT event_type, count(k) AS n, floor((avg(k)) * 1000000 + 0.5) / 1000000 AS avg_k, max(k) AS max_k
FROM (SELECT event_type, CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS INTEGER) AS k FROM events)
GROUP BY event_type""",

    "q21_doc_dedup_exact" ->
      """SELECT sha256(text) AS content_hash, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
FROM documents
GROUP BY sha256(text)""",

    // canonicalized dedup: the SAME normalize chain (lower -> strip
    // non-alphanumerics -> collapse whitespace -> trim) then sha256;
    // DuckDB regexp_replace needs the 'g' flag Spark implies
    "q197_canon_dedup" ->
      """SELECT sha256(trim(regexp_replace(
    regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')))
    AS canon_hash,
  min(doc_id) AS keeper_doc_id, count(*) AS n_copies
FROM documents GROUP BY 1""",

    "q22_near_dup_pairs" -> q22MinhashSql,

    "q23_token_stats" ->
      """WITH scored AS (
  SELECT lang,
    len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS ntok,
    length(text) AS lc,
    length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
  FROM documents
), q AS (
  SELECT lang, ntok,
    floor((least(lc / 200.0, 1.0) * 0.4
      + (CASE WHEN lc / greatest(ntok, 1.0) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.4
      + (CASE WHEN np / greatest(lc, 1.0) <= 0.2 THEN 1.0 ELSE 0.3 END) * 0.2) * 1000000 + 0.5) / 1000000 AS q
  FROM scored
)
SELECT lang, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS total_tokens,
  floor((avg(ntok)) * 1000000 + 0.5) / 1000000 AS avg_tokens, floor((avg(q)) * 1000000 + 0.5) / 1000000 AS avg_quality
FROM q
GROUP BY lang""",

    "q24_knn_cosine" ->
      """WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(dp / (na * nb), 6) AS score
FROM (
  SELECT e.vec_id,
    list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.qe[i] AS DOUBLE))) AS dp,
    sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
    sqrt(list_sum(list_transform(qv.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
  FROM embeddings e, qv
)
WHERE vec_id <> 0
ORDER BY score DESC, vec_id
LIMIT 10""",

    // hybrid retrieval: q127's BM25 leg (k=50) + q24's cosine leg
    // (k=50), fused by reciprocal rank — ranks are exact integers both
    // sides so the rrf double is identical with no rounding; a missing
    // leg contributes 0 via the same coalesce both engines
    "q200_hybrid_retrieval" ->
      """WITH tk AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS toks
  FROM documents
), d AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
    list_filter(toks, t -> t IN ('dup', 'key', 'window', 'join', 'batch')) AS qt
  FROM tk
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
    floor(avg(dl) * 1000000 + 0.5) / 1000000 AS avgdl
  FROM d
), tf AS (
  SELECT doc_id, dl, t AS term, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(qt) AS t FROM d)
  GROUP BY 1, 2, 3
), w AS (
  SELECT doc_id, dl, term, tf, count(*) OVER (PARTITION BY term) AS df FROM tf
), sc AS (
  SELECT doc_id,
    floor(ln(1e0 + (n - df + 0.5e0) / (df + 0.5e0)) * 1000000 + 0.5) / 1000000 AS idf,
    floor(tf * 2.2e0 / (tf + 1.2e0 * (0.25e0 + 0.75e0 * dl / avgdl)) * 1000000 + 0.5) / 1000000 AS tfn
  FROM w CROSS JOIN stats
), perdoc AS (
  SELECT doc_id,
    CAST(sum(CAST(floor(idf * tfn * 1e6 + 0.5e0) AS BIGINT)) AS BIGINT) AS sm
  FROM sc GROUP BY 1
), bm AS (
  SELECT doc_id AS id,
    CAST(row_number() OVER (ORDER BY sm DESC, doc_id) AS BIGINT) AS rb
  FROM (SELECT * FROM perdoc ORDER BY sm DESC, doc_id LIMIT 50)
), qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
cs AS (
  SELECT vec_id AS id, round(dp / (na * nb), 6) AS score
  FROM (
    SELECT e.vec_id,
      list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.qe[i] AS DOUBLE))) AS dp,
      sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
      sqrt(list_sum(list_transform(qv.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
    FROM embeddings e, qv
  ) WHERE vec_id <> 0
), cr AS (
  SELECT id, CAST(row_number() OVER (ORDER BY score DESC, id) AS BIGINT) AS rc
  FROM (SELECT * FROM cs ORDER BY score DESC, id LIMIT 50)
), fused AS (
  SELECT COALESCE(bm.id, cr.id) AS id, bm.rb, cr.rc,
    coalesce(1.0 / (60.0 + CAST(bm.rb AS DOUBLE)), 0.0)
      + coalesce(1.0 / (60.0 + CAST(cr.rc AS DOUBLE)), 0.0) AS rrf
  FROM bm FULL OUTER JOIN cr ON bm.id = cr.id
)
SELECT CAST(row_number() OVER (ORDER BY rrf DESC, id) AS BIGINT) AS rank,
  id, rb AS bm25_rank, rc AS cos_rank, rrf
FROM (SELECT * FROM fused ORDER BY rrf DESC, id LIMIT 10)""",

    "q25_fingerprint" ->
      """SELECT doc_id,
  list_min(list_transform(range(1, greatest(length(text) - 7, 1) + 1), i -> md5(substr(text, i, 8)))) AS fingerprint,
  md5(text) AS content_md5
FROM documents""",

    "q26_token_histogram" ->
      """SELECT token, count(*) AS n
FROM (SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token
LIMIT 50""",

    "q27_ingest_roundtrip" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events""",

    "q29_last_per_key" ->
      """SELECT user_id, event_id, ts, round(value, 4) AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM events)
WHERE rn = 1""",

    "q30_session_windows" ->
      """WITH o AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), g AS (
  SELECT user_id, ts, value,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS grp
  FROM o
)
SELECT user_id, min(ts) AS session_start, count(*) AS n, round(sum(value), 4) AS total
FROM g GROUP BY user_id, grp""",

    "q31_sliding_windows" ->
      """SELECT event_type, win_start, count(*) AS n, round(sum(value), 4) AS total
FROM (
  SELECT event_type, value, time_bucket(INTERVAL '10 minutes', ts) AS win_start FROM events
  UNION ALL
  SELECT event_type, value,
    time_bucket(INTERVAL '10 minutes', ts, TIMESTAMP '2000-01-01 00:05:00') AS win_start
  FROM events
)
GROUP BY event_type, win_start""",

    "q32_grouping_sets" ->
      """SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())""",

    "q33_percentiles" ->
      """SELECT event_type,
  floor((quantile_cont(value, 0.5)) * 1000000 + 0.5) / 1000000 AS p50,
  floor((quantile_cont(value, 0.9)) * 1000000 + 0.5) / 1000000 AS p90,
  floor((quantile_cont(value, 0.99)) * 1000000 + 0.5) / 1000000 AS p99
FROM events GROUP BY event_type""",

    "q34_stats_agg" ->
      """SELECT event_type,
  round(stddev_samp(value), 6) AS sd,
  floor((var_samp(value)) * 1000000 + 0.5) / 1000000 AS vr,
  floor((covar_samp(value, CAST(user_id AS DOUBLE))) * 1000000 + 0.5) / 1000000 AS cv,
  round(corr(value, CAST(user_id AS DOUBLE)), 6) AS cr
FROM events GROUP BY event_type""",

    "q35_pivot" ->
      """SELECT user_id,
  count(*) FILTER (event_type = 'click') AS click,
  count(*) FILTER (event_type = 'error') AS error,
  count(*) FILTER (event_type = 'purchase') AS purchase,
  count(*) FILTER (event_type = 'signup') AS signup,
  count(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY user_id""",

    "q36_union_feeds" ->
      """SELECT event_id, user_id, ts, round(value, 4) AS value, 'purchase' AS feed
FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT event_id, user_id, ts, NULL AS value, 'view' AS feed
FROM events WHERE event_type = 'view'""",

    "q37_jaccard_near_dups" -> q37JaccardSql,

    // asymmetric containment over the same candidate set as q37:
    // |A∩B| / min(|A|,|B|) — the excerpt detector
    "q123_containment_pairs" ->
      (s"""WITH $minhashPairsCte,
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, length(text)-6), i -> substr(text, i, 8))) AS s
  FROM documents WHERE length(text) >= 8
), scored AS (
  SELECT p.doc_a, p.doc_b,
    floor((CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
      / least(len(sa.s), len(sb.s))) * 1000000 + 0.5) / 1000000 AS containment,
    floor((CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
      / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))) * 1000000 + 0.5) / 1000000 AS jaccard
  FROM pairs p
  JOIN sh sa ON p.doc_a = sa.doc_id
  JOIN sh sb ON p.doc_b = sb.doc_id
)
SELECT doc_a, doc_b, containment, jaccard FROM scored WHERE containment >= 0.5"""),

    "q38_langid" ->
      """WITH h AS (
  SELECT doc_id, lang,
    len(list_filter(toks, t -> list_contains(['the','a','and'], t))) AS h_en,
    len(list_filter(toks, t -> list_contains(['der','die','das'], t))) AS h_de,
    len(list_filter(toks, t -> list_contains(['el','la','los'], t))) AS h_es
  FROM (SELECT doc_id, lang,
          list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS toks
        FROM documents)
)
SELECT doc_id, lang,
  CASE WHEN h_de >= h_en AND h_de >= h_es THEN 'de'
       WHEN h_en >= h_es THEN 'en'
       ELSE 'es' END AS pred_lang
FROM h""",

    "q39_quality_scores" ->
      """WITH m AS (
  SELECT doc_id, text,
    len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS ntok,
    len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0)) AS ltok,
    len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        x -> list_contains(['the','a','and','of','to'], x))) AS sw,
    length(text) AS lc,
    length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
  FROM documents
)
SELECT doc_id,
  floor((least(lc / 200.0, 1.0) * 0.4
    + (CASE WHEN lc / greatest(ntok, 1.0) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.4
    + (CASE WHEN np / greatest(lc, 1.0) <= 0.2 THEN 1.0 ELSE 0.3 END) * 0.2) * 1000000 + 0.5) / 1000000 AS quality,
  ntok,
  floor((sw / greatest(ltok, 1.0)) * 1000000 + 0.5) / 1000000 AS stopword_ratio
FROM m""",

    "q40_simhash_pairs" -> q40SimhashSql,

    "q225_stream_near_dups" -> q225NearDupSql,

    "q226_curation_gate" -> q226GateSql,

    "q240_curation_chain" -> q240ChainSql,

    // persisted ANN index: the oracle cannot replicate a k-means fit,
    // so it checks the VERDICT row (the q66/q140 discipline): 5 queries
    // x full top-10 exist, recall over the persisted+extended index
    // clears the q66 gate, and the index's log-only row accounting
    // covers EXACTLY the corpus (fit on 4/5, extended with 1/5).
    "q227_persisted_ann_index" ->
      """SELECT CAST(5 AS BIGINT) AS n_queries, CAST(50 AS BIGINT) AS n_exact,
  true AS recall_ok,
  (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_indexed""",

    // streaming as-of enrichment, batch-twin closure: views collapse to
    // one quote per (user, ts) — max value, the q19 uniqueness
    // discipline — then DuckDB's native ASOF LEFT JOIN picks the latest
    // quote at-or-before each purchase; the 1-hour staleness tolerance
    // nulls the match in a projection (an older in-tolerance quote
    // cannot exist when the latest is out — lag grows backwards), and
    // lag_us stays exact integer micros.
    "q228_stream_asof" ->
      """WITH trades AS (
  SELECT CAST(user_id AS VARCHAR) AS key, event_id AS id, ts, value
  FROM events WHERE event_type = 'purchase'
), quotes AS (
  SELECT CAST(user_id AS VARCHAR) AS key, ts, max(value) AS qv
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT t.key, t.id, t.ts AS datetime, t.value,
  CASE WHEN q.ts IS NOT NULL AND epoch_us(t.ts) - epoch_us(q.ts) <= 3600000000
       THEN q.ts END AS quote_ts,
  CASE WHEN q.ts IS NOT NULL AND epoch_us(t.ts) - epoch_us(q.ts) <= 3600000000
       THEN q.qv END AS quote_value,
  CASE WHEN q.ts IS NOT NULL AND epoch_us(t.ts) - epoch_us(q.ts) <= 3600000000
       THEN epoch_us(t.ts) - epoch_us(q.ts) END AS lag_us
FROM trades t ASOF LEFT JOIN quotes q ON t.key = q.key AND q.ts <= t.ts""",

    // wire-schema drift: signatures are SORTED key lists, so DuckDB
    // rebuilds each shape with json_object (values irrelevant) and the
    // per-shape counts are orderkey arithmetic; the malformed truncation
    // breaks mid-string in both engines (signature '<malformed>').
    "q232_wire_drift" ->
      """WITH v AS (
  SELECT o_orderkey % 9 AS m, count(*) AS n FROM orders GROUP BY 1
), forms AS (
  SELECT m, n,
    CASE WHEN m = 3 THEN NULL
         ELSE list_sort(json_keys(
           CASE WHEN m = 0 THEN json_object('Datetime',1,'Open',1,'High',1,'Low',1,'Close',1,'Adj Close',1,'Volume',1,'Dividends',1,'Stock Splits',1,'ticker',1,'Source',1)
                WHEN m = 1 THEN json_object('Datetime',1,'Open',1,'High',1,'Low',1,'Close',1,'Adj Close',1,'Volume',1,'Stock Splits',1,'ticker',1)
                WHEN m = 2 THEN json_object('Datetime',1,'Open',1,'High',1,'Low',1,'Close',1,'Adj Close',1,'Volume',1,'Dividends',1,'Stock Splits',1,'Ticker',1)
                ELSE json_object('Datetime',1,'Open',1,'High',1,'Low',1,'Close',1,'Adj Close',1,'Volume',1,'Dividends',1,'Stock Splits',1,'ticker',1) END)) END AS ks
  FROM v
), decl AS (
  SELECT list_sort(['Datetime','Open','High','Low','Close','Adj Close',
    'Volume','Dividends','Stock Splits','ticker']) AS d
), scored AS (
  SELECT
    CASE WHEN ks IS NULL THEN '<malformed>'
         ELSE array_to_string(ks, ',') END AS signature,
    CASE WHEN ks IS NULL THEN 0
         ELSE len(list_filter(ks, k -> NOT list_contains(d, k))) END AS n_unknown,
    CASE WHEN ks IS NULL THEN 0
         ELSE len(list_filter(d, k -> NOT list_contains(ks, k))) END AS n_missing,
    n
  FROM forms, decl
)
SELECT signature,
  CASE WHEN signature = '<malformed>' THEN 'malformed'
       WHEN n_unknown > 0 OR n_missing > 0 THEN 'drifted'
       ELSE 'declared_exact' END AS lane,
  CAST(sum(n) AS BIGINT) AS n,
  CAST(n_unknown AS INT) AS n_unknown, CAST(n_missing AS INT) AS n_missing
FROM scored GROUP BY 1, 2, 4, 5""",

    // feed-gap ledger: the fold twin dedups (key, ts) then chains in
    // ascending order, which emits exactly the distinct-lag gap set.
    "q231_feed_gaps" ->
      """WITH e AS (
  SELECT DISTINCT CAST(user_id AS VARCHAR) AS key, ts FROM events
), g AS (
  SELECT key, lag(ts) OVER (PARTITION BY key ORDER BY ts) AS gap_start,
    ts AS gap_end
  FROM e
)
SELECT key, gap_start, gap_end,
  epoch_us(gap_end) - epoch_us(gap_start) AS gap_us
FROM g WHERE epoch_us(gap_end) - epoch_us(gap_start) > 21600000000""",

    // cross-feed reconciliation: the bar feed is the trade grain with
    // deterministic corruption, so each lane's count and volume total
    // is pure arithmetic over the same hash conditions; precedence
    // (presence > volume > price) matches the engine's when-chain.
    "q230_feed_reconcile" ->
      """WITH g AS (
  SELECT user_id, epoch_us(ts) // 300000000 AS bucket,
    CAST(count(*) AS BIGINT) AS volume, max(value) AS price
  FROM events GROUP BY 1, 2
), h AS (
  SELECT *, (user_id + bucket) % 1000 AS hh FROM g
), bars AS (
  SELECT user_id, bucket,
    CASE WHEN hh % 13 = 0 THEN volume + 7 ELSE volume END AS bar_volume,
    CASE WHEN hh % 17 = 0 THEN price + 5.0 ELSE price END AS bar_price
  FROM h WHERE hh % 11 <> 0
  UNION ALL
  SELECT user_id, bucket + 10000000, volume, price FROM h WHERE hh % 19 = 0
), r AS (
  SELECT CASE WHEN b.bar_volume IS NULL THEN 'missing_in_bars'
              WHEN g.volume IS NULL THEN 'missing_in_trades'
              WHEN b.bar_volume <> g.volume THEN 'volume_mismatch'
              WHEN abs(b.bar_price - g.price) > 0.5 THEN 'price_mismatch'
              ELSE 'ok' END AS lane,
    g.volume AS trade_volume
  FROM bars b FULL OUTER JOIN g
    ON b.user_id = g.user_id AND b.bucket = g.bucket
)
SELECT lane, CAST(count(*) AS BIGINT) AS n,
  CAST(COALESCE(sum(trade_volume), 0) AS BIGINT) AS trade_volume_sum
FROM r GROUP BY 1""",

    // shape-gated strict ingest: lane counts and the ingested volume
    // total are pure orderkey arithmetic (shape variants every 9th key,
    // volume = key % 50, quality gate drops volume 0).
    "q235_shape_gated_ingest" ->
      """WITH c AS (
  SELECT o_orderkey % 9 AS m, o_orderkey % 50 AS vol FROM orders
)
SELECT 'malformed' AS lane, CAST(count(*) AS BIGINT) AS n,
  CAST(0 AS BIGINT) AS total_volume
FROM c WHERE m = 3
UNION ALL
SELECT 'drifted', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT)
FROM c WHERE m IN (0, 1, 2)
UNION ALL
SELECT 'ingested', CAST(count(*) AS BIGINT), CAST(sum(vol) AS BIGINT)
FROM c WHERE m >= 4 AND vol > 0
UNION ALL
SELECT 'gate_dropped', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT)
FROM c WHERE m >= 4 AND vol = 0""",

    // shape-gated strict ingest as a live sink: (batch, lane) counts are
    // orderkey arithmetic — batch = key mod 3 (the deterministic chop),
    // lane by the same mod-9 shape variants as q235.
    "q238_shape_gate_stream" ->
      """WITH c AS (
  SELECT o_orderkey % 3 AS b, o_orderkey % 9 AS m, o_orderkey % 50 AS vol
  FROM orders
)
SELECT CAST(b AS BIGINT) AS batch_id,
  CASE WHEN m = 3 THEN 'malformed'
       WHEN m IN (0, 1, 2) THEN 'drifted'
       WHEN vol = 0 THEN 'gate_volume'
       ELSE 'ingested' END AS lane,
  CAST(count(*) AS BIGINT) AS n,
  CAST(COALESCE(sum(CASE WHEN m >= 4 AND vol > 0 THEN vol END), 0) AS BIGINT)
    AS volume_sum
FROM c GROUP BY 1, 2""",

    // streaming reconciliation twin: the q230 lane arithmetic extended
    // with the q233 action/healed columns — the stream's watermark-final
    // verdicts must land exactly the relational reconcile+heal.
    "q239_recon_stream" ->
      """WITH g AS (
  SELECT user_id, epoch_us(ts) // 300000000 AS bucket,
    CAST(count(*) AS BIGINT) AS volume, max(value) AS price
  FROM events GROUP BY 1, 2
), h AS (
  SELECT *, (user_id + bucket) % 1000 AS hh FROM g
), bars AS (
  SELECT user_id, bucket,
    CASE WHEN hh % 13 = 0 THEN volume + 7 ELSE volume END AS bar_volume,
    CASE WHEN hh % 17 = 0 THEN price + 5.0 ELSE price END AS bar_price
  FROM h WHERE hh % 11 <> 0
  UNION ALL
  SELECT user_id, bucket + 10000000, volume, price FROM h WHERE hh % 19 = 0
), r AS (
  SELECT b.bar_volume, b.bar_price,
    g.volume AS trade_volume, g.price AS trade_price,
    CASE WHEN b.bar_volume IS NULL THEN 'missing_in_bars'
         WHEN g.volume IS NULL THEN 'missing_in_trades'
         WHEN b.bar_volume <> g.volume THEN 'volume_mismatch'
         WHEN abs(b.bar_price - g.price) > 0.5 THEN 'price_mismatch'
         ELSE 'ok' END AS lane
  FROM bars b FULL OUTER JOIN g
    ON b.user_id = g.user_id AND b.bucket = g.bucket
), ra AS (
  SELECT *,
    CASE lane WHEN 'ok' THEN 'kept_bar'
         WHEN 'missing_in_bars' THEN 'backfilled'
         WHEN 'missing_in_trades' THEN 'dropped_phantom'
         ELSE 'overridden' END AS action
  FROM r
), healed AS (
  SELECT lane, action, trade_volume,
    CASE WHEN action = 'kept_bar' THEN bar_volume
         WHEN action = 'dropped_phantom' THEN NULL
         ELSE trade_volume END AS healed_volume,
    CASE WHEN action = 'kept_bar' THEN bar_price
         WHEN action = 'dropped_phantom' THEN NULL
         ELSE trade_price END AS healed_price
  FROM ra
)
SELECT lane, action, CAST(count(*) AS BIGINT) AS n,
  CAST(COALESCE(sum(trade_volume), 0) AS BIGINT) AS trade_volume_sum,
  CAST(COALESCE(sum(healed_volume), 0) AS BIGINT) AS volume_sum,
  CAST(COALESCE(sum(floor(healed_price * 100 + 0.5)), 0) AS BIGINT) AS price_cents
FROM healed GROUP BY 1, 2""",

    // index maintenance policy: the verdict-row discipline — both
    // branches' actions, bits, and serving-index coverage are fixture
    // arithmetic (recluster on the healthy fragmented index covering
    // the whole corpus; refit after the displaced increment covering
    // corpus + increment under fresh ids).
    "q241_index_maintenance" ->
      """SELECT 'healthy_fragmented' AS phase, 'recluster' AS action,
  false AS refit_due, true AS files_bounded,
  (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_indexed_out
UNION ALL
SELECT 'drifted', 'refit', true, true,
  (SELECT CAST(2 * count(*) AS BIGINT) FROM embeddings)""",

    // retrieval-quality metrics, oracle-EXACT (no verdict bits): the
    // q127 BM25 chain per single-term query (same rounded idf/tfn,
    // long-micros per-doc sums, top-10 by (micros desc, id)), graded
    // truth = the term's tf, and the micro-quantized DCG discipline —
    // every metric is one final correctly-rounded division.
    "q242_ranking_metrics" ->
      """WITH tk AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS toks
  FROM documents
), d AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM tk
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
    floor(avg(dl) * 1000000 + 0.5) / 1000000 AS avgdl
  FROM d
), terms AS (
  SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'dup'), (2, 'key'),
    (3, 'window'), (4, 'join'), (5, 'batch')) AS t(qid, term)
), pos AS (
  SELECT t.qid, d.doc_id, d.dl,
    CAST(len(list_filter(d.toks, x -> x = t.term)) AS BIGINT) AS tf
  FROM d CROSS JOIN terms t
  WHERE len(list_filter(d.toks, x -> x = t.term)) > 0
), w AS (
  SELECT *, count(*) OVER (PARTITION BY qid) AS df FROM pos
), sc AS (
  SELECT qid, doc_id,
    CAST(floor(
      (floor(ln(1e0 + (n - df + 0.5e0) / (df + 0.5e0)) * 1000000 + 0.5) / 1000000)
      * (floor(tf * 2.2e0 / (tf + 1.2e0 * (0.25e0 + 0.75e0 * dl / avgdl)) * 1000000 + 0.5) / 1000000)
      * 1e6 + 0.5e0) AS BIGINT) AS sm
  FROM w CROSS JOIN stats
), ranked AS (
  SELECT qid, doc_id,
    row_number() OVER (PARTITION BY qid ORDER BY sm DESC, doc_id) AS rank
  FROM sc
), r10 AS (
  SELECT * FROM ranked WHERE rank <= 10
), joined AS (
  SELECT r.qid, r.rank, COALESCE(p.tf, 0) AS grade
  FROM r10 r LEFT JOIN pos p ON r.qid = p.qid AND r.doc_id = p.doc_id
), got AS (
  SELECT qid,
    sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END) AS n_hits,
    min(CASE WHEN grade > 0 THEN rank END) AS first_rel,
    sum(CAST(floor(grade / ln(rank + 1e0) * 1000000 + 0.5e0) AS BIGINT)) AS dcg
  FROM joined GROUP BY qid
), ideal AS (
  SELECT qid, count(*) AS n_rel,
    sum(CASE WHEN irank <= 10 THEN
      CAST(floor(grade / ln(irank + 1e0) * 1000000 + 0.5e0) AS BIGINT)
      ELSE 0 END) AS idcg
  FROM (SELECT qid, tf AS grade,
          row_number() OVER (PARTITION BY qid ORDER BY tf DESC, doc_id) AS irank
        FROM pos)
  GROUP BY qid
)
SELECT i.qid, CAST(i.n_rel AS BIGINT) AS n_rel,
  CAST(COALESCE(g.n_hits, 0) AS BIGINT) AS n_hits,
  floor(COALESCE(g.n_hits, 0) / CAST(i.n_rel AS DOUBLE) * 1000000 + 0.5) / 1000000 AS recall_k,
  floor(COALESCE(1e0 / g.first_rel, 0e0) * 1000000 + 0.5) / 1000000 AS mrr_k,
  floor(CAST(COALESCE(g.dcg, 0) AS DOUBLE) / CAST(i.idcg AS DOUBLE) * 1000000 + 0.5) / 1000000 AS ndcg_k
FROM ideal i LEFT JOIN got g ON i.qid = g.qid""",

    // bulk ANN serving: the q227 verdict-row discipline (a k-means fit
    // is not oracle-replicable) — the fixed 500-base x 25-replica query
    // frame makes the accounting constants, the recall gate and the
    // replica-consistency bit both predicted true.
    "q236_bulk_ann_serve" ->
      """SELECT CAST(12500 AS BIGINT) AS n_queries,
  CAST(125000 AS BIGINT) AS n_served,
  true AS recall_ok, true AS replicas_consistent,
  (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_indexed""",

    // PQ-compressed bulk serving: the q236 verdict-row discipline — the
    // fixed 500 x 25 query frame makes the accounting constants, the
    // recall gate / replica consistency / codes-cover-index bits all
    // predicted true (fit 4/5 + encode-extend 1/5 covers the corpus).
    "q243_pq_bulk_serve" ->
      """SELECT CAST(12500 AS BIGINT) AS n_queries,
  CAST(125000 AS BIGINT) AS n_served,
  true AS recall_ok, true AS replicas_consistent,
  true AS codes_cover_index,
  (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_indexed""",

    // serving-pointer lifecycle: fixture arithmetic — the refit covers
    // corpus + displaced increment (2n), the rollback re-serves gen0
    // which by then ALSO holds the extend (2n); the phase/refit bits and
    // the time-travel read are structural.
    "q245_index_pointer" ->
      """SELECT 'initial' AS phase, false AS serving_is_refit,
  true AS past_read_ok,
  (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_indexed
UNION ALL
SELECT 'refit_promoted', true, true,
  (SELECT CAST(2 * count(*) AS BIGINT) FROM embeddings)
UNION ALL
SELECT 'rolled_back', false, true,
  (SELECT CAST(2 * count(*) AS BIGINT) FROM embeddings)""",

    // ranker evaluation closure: the q65 exact-cosine chain (truth +
    // the RRF exact leg), the q82 int8 chain (the quantized ranker and
    // fusion leg), the q200 RRF arithmetic (1e0-literals so DuckDB
    // stays in DOUBLE, never DECIMAL), and the q242 micro-quantized
    // metric discipline — metrics hash-exact for both replicable
    // rankers; the k-means bulk-ANN ranker contributes one constant
    // gate row (recall gate predicted true, -1 sentinels for withheld
    // non-replicable values).
    "q244_ranker_eval" ->
      """WITH n AS (
  SELECT vec_id, embedding,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
), qv AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
exsc AS (
  SELECT qv.qid, e.vec_id AS id,
    round(
      list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.qe[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform(qv.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS score
  FROM embeddings e, qv WHERE e.vec_id <> qv.qid
), ex50 AS (
  SELECT * FROM (
    SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS re
    FROM exsc) WHERE re <= 50
), q8 AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / nrm * 127.0 + 0.5) AS BIGINT)) AS cv
  FROM n
), qs AS (SELECT vec_id AS qid, cv AS qcv FROM q8 WHERE vec_id < 8),
qsc AS (
  SELECT qs.qid, c.vec_id AS id,
    CAST(list_sum(list_transform(range(1, 65), i -> c.cv[i] * qs.qcv[i])) AS BIGINT) AS qdot
  FROM q8 c, qs WHERE c.vec_id <> qs.qid
), qu50 AS (
  SELECT * FROM (
    SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY qdot DESC, id) AS rq
    FROM qsc) WHERE rq <= 50
), fused AS (
  SELECT COALESCE(e.qid, u.qid) AS qid, COALESCE(e.id, u.id) AS id,
    COALESCE(1e0 / (60e0 + e.re), 0e0) + COALESCE(1e0 / (60e0 + u.rq), 0e0) AS rrf
  FROM ex50 e FULL OUTER JOIN qu50 u ON e.qid = u.qid AND e.id = u.id
), fr AS (
  SELECT * FROM (
    SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, id) AS rank
    FROM fused) WHERE rank <= 10
), rk AS (
  SELECT 'quant_int8' AS ranker, qid, id, rq AS rank FROM qu50 WHERE rq <= 10
  UNION ALL
  SELECT 'rrf_fusion', qid, id, rank FROM fr
), tr AS (
  SELECT qid, id, CAST(11 - re AS BIGINT) AS grade FROM ex50 WHERE re <= 10
), joined AS (
  SELECT r.ranker, r.qid, r.rank, COALESCE(t.grade, 0) AS grade
  FROM rk r LEFT JOIN tr t ON r.qid = t.qid AND r.id = t.id
), got AS (
  SELECT ranker, qid,
    sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END) AS n_hits,
    min(CASE WHEN grade > 0 THEN rank END) AS first_rel,
    sum(CAST(floor(grade / ln(rank + 1e0) * 1000000 + 0.5e0) AS BIGINT)) AS dcg
  FROM joined GROUP BY 1, 2
), ideal AS (
  SELECT qid, count(*) AS n_rel,
    sum(CASE WHEN irank <= 10 THEN
      CAST(floor(grade / ln(irank + 1e0) * 1000000 + 0.5e0) AS BIGINT)
      ELSE 0 END) AS idcg
  FROM (SELECT qid, grade, id,
          row_number() OVER (PARTITION BY qid ORDER BY grade DESC, id) AS irank
        FROM tr)
  GROUP BY qid
)
SELECT rr.ranker, i.qid, CAST(i.n_rel AS BIGINT) AS n_rel,
  CAST(COALESCE(g.n_hits, 0) AS BIGINT) AS n_hits,
  floor(COALESCE(g.n_hits, 0) / CAST(i.n_rel AS DOUBLE) * 1000000 + 0.5) / 1000000 AS recall_k,
  floor(COALESCE(1e0 / g.first_rel, 0e0) * 1000000 + 0.5) / 1000000 AS mrr_k,
  floor(CAST(COALESCE(g.dcg, 0) AS DOUBLE) / CAST(i.idcg AS DOUBLE) * 1000000 + 0.5) / 1000000 AS ndcg_k
FROM (VALUES ('quant_int8'), ('rrf_fusion')) rr(ranker)
CROSS JOIN ideal i
LEFT JOIN got g ON g.ranker = rr.ranker AND g.qid = i.qid
UNION ALL
SELECT 'ivf_bulk_gate', CAST(-1 AS BIGINT), CAST(8 AS BIGINT),
  CAST(-1 AS BIGINT), 1e0, -1e0, -1e0""",

    // streaming ANN serve through the pointer: the verdict-row
    // discipline (k-means serves are not SQL-replicable) — exact
    // accounting constants per epoch, the promote flip, and the
    // stream==direct twin bit, all predicted.
    "q248_ann_serve_stream" ->
      """SELECT CAST(0 AS BIGINT) AS epoch, CAST(40 AS BIGINT) AS n_queries,
  CAST(400 AS BIGINT) AS n_served, false AS served_from_promoted,
  true AS twin_match
UNION ALL
SELECT 1, 40, 400, true, true""",

    // Tx streaming source replay: the 3-commit append train streamed
    // out and landed downstream must reproduce the source rows EXACTLY
    // — full-row parity against the same parquet, no arithmetic at all
    // (values pass through both engines untouched, bit-identical).
    "q249_tx_stream_replay" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders""",

    // incremental MV: the maintained view must equal the full GROUP BY
    // (exact integer cents — the incremental merge reorders addition,
    // so the measure domain is exact by construction); rows_in_2 is the
    // third commit's row count (drain 2 read ONLY the increment), the
    // no-op / replay verdicts are constants of the txn discipline.
    "q252_incremental_mv" ->
      """WITH c AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
    o_orderpriority,
    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders)
SELECT order_year, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(cents) AS BIGINT) AS cents_total,
  min(cents) AS cents_min, max(cents) AS cents_max,
  (SELECT CAST(count(*) AS BIGINT) FROM c WHERE order_year >= 1997)
    AS rows_in_2,
  true AS incremental_ok, true AS noop_ok, true AS replay_ok
FROM c GROUP BY 1, 2""",

    // incremental replication: the replica's per-year aggregate under
    // the survivor predicate — the delete ran BEFORE the fourth append,
    // so m7≡3 rows of the m4≡3 slice survive; applied-commit counts and
    // the no-op/content bits are constants of the train.
    "q253_replication" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
  CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total,
  CAST(3 AS BIGINT) AS appends_1, CAST(1 AS BIGINT) AS deletes_1,
  CAST(1 AS BIGINT) AS layout_skipped_1, CAST(1 AS BIGINT) AS appends_2,
  true AS noop_3, true AS content_match
FROM orders
WHERE o_orderkey % 7 <> 3 OR o_orderkey % 4 = 3
GROUP BY 1""",

    // manifest cut: the final resolved epoch covers the whole table;
    // the torn-read count is the first two year buckets across both
    // lanes (the even lane's physically-landed third bucket is
    // invisible through the manifest), epoch-0 the first bucket alone.
    "q254_manifest_cut" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
  CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total,
  CAST(1 AS BIGINT) AS torn_epoch,
  (SELECT CAST(count(*) AS BIGINT) FROM orders
     WHERE year(o_orderdate) <= 1996) AS n_at_torn,
  (SELECT CAST(count(*) AS BIGINT) FROM orders
     WHERE year(o_orderdate) <= 1994) AS n_epoch0,
  CAST(2 AS BIGINT) AS final_epoch, true AS replay_ok
FROM orders GROUP BY 1""",

    // last-writer-wins upsert: only the strictly-newer update (m5≡0,
    // ×2) and the in-batch max (m5≡3, ×3) land; the stale replay
    // (m5≡1) and the tie (m5≡2) keep the stored row — absent from the
    // sum by construction.
    "q255_lww_upsert" ->
      """WITH c AS (
  SELECT o_orderkey, o_orderpriority,
    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
    o_orderkey % 5 AS m5
  FROM orders)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE WHEN m5 = 0 THEN cents * 2
                WHEN m5 = 3 THEN cents * 3
                ELSE cents END) AS BIGINT) AS cents_total
FROM c GROUP BY 1""",

    // schema catch-up: the drift-class arithmetic — mod-9 payloads gain
    // the promoted Source key (land on replay), other mod-11 payloads
    // gain the unpromoted Origin key (stay quarantined); ingest totals
    // and the idempotence bit are constants of the same arithmetic.
    "q251_schema_catchup" ->
      """WITH c AS (
  SELECT count(*) FILTER (WHERE o_orderkey % 9 = 0) AS a,
    count(*) FILTER (WHERE o_orderkey % 9 <> 0 AND o_orderkey % 11 = 0) AS b,
    count(*) AS total
  FROM orders)
SELECT 'landed_now' AS lane, CAST(a AS BIGINT) AS n,
  CAST(total - a - b AS BIGINT) AS n_ingested_v1,
  CAST(total - b AS BIGINT) AS n_ingested_after,
  true AS replay_idempotent
FROM c
UNION ALL
SELECT 'still_quarantined', b, total - a - b, total - b, true FROM c""",

    // erasure policy: q247's surviving predicate per year, plus the
    // policy verdict constants — young pass reports only (time travel
    // intact), due pass vacuums (pre-delete version unreadable).
    "q250_erasure_policy" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
  CAST(count(*) AS BIGINT) AS n,
  round(sum(o_totalprice), 2) AS total,
  'none' AS young_action, true AS travel_before_due,
  'vacuum' AS acted_action, CAST(1 AS BIGINT) AS n_due,
  CAST(0 AS BIGINT) AS still_readable_after, true AS erased_ok
FROM orders WHERE o_orderkey % 7 <> 3 GROUP BY 1""",

    // keyed delete: the surviving predicate restated relationally (the
    // q62 per-year aggregate discipline); n_before/n_deleted_cdc are
    // plain counts, travel/prune bits structural (3 target ids cannot
    // cover more than 3 of 8 bucket files).
    "q247_keyed_delete" ->
      """WITH surv0 AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 3),
tiny AS (SELECT o_orderkey FROM surv0 ORDER BY o_orderkey LIMIT 3),
surv AS (SELECT * FROM surv0
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM tiny))
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
  CAST(count(*) AS BIGINT) AS n,
  round(sum(o_totalprice), 2) AS total,
  (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_before,
  (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_orderkey % 7 = 3)
    AS n_deleted_cdc,
  true AS travel_ok, true AS pruned_ok
FROM surv GROUP BY 1""",

    // end-to-end ingest capstone: every (batch, lane) count restated as
    // arithmetic — year-bucketed batches, the q229 watermark-replica
    // progression (max good-row event time per batch, applied one batch
    // later, 400-day delay), m13 corruption lanes, 730-day stragglers,
    // and verbatim re-sends whose on-time copies are dups (their
    // originals are non-straggler clean rows, on-time by the same
    // arithmetic, hence always ingested at-or-before the copy's epoch).
    "q246_e2e_ingest" ->
      """WITH r AS (
  SELECT o_orderkey AS k, CAST(o_orderdate AS TIMESTAMP) AS ts0,
    CASE WHEN year(o_orderdate) <= 1996 THEN 0
         WHEN year(o_orderdate) <= 1998 THEN 1 ELSE 2 END AS b,
    o_orderkey % 13 AS m13, o_orderkey % 17 AS m17
  FROM orders
), w1 AS (
  SELECT k, b, m13, m17,
    CASE WHEN m17 = 0 THEN ts0 - INTERVAL 730 DAY ELSE ts0 END AS ts
  FROM r
), good AS (
  SELECT b, ts, false AS is_copy FROM w1 WHERE m13 NOT IN (0, 1, 2)
  UNION ALL
  SELECT CASE WHEN b < 2 THEN b + 1 ELSE 2 END, ts, true
  FROM w1 WHERE m13 = 5 AND m17 <> 0
), mx AS (
  SELECT b, max(epoch_ms(ts)) AS mts FROM good GROUP BY b
), wmv AS (
  SELECT b, max(mts) OVER (ORDER BY b
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 34560000000 AS wm
  FROM mx
), lanes AS (
  SELECT g.b,
    CASE WHEN w.wm IS NOT NULL AND epoch_ms(g.ts) < w.wm THEN 'late'
         WHEN g.is_copy THEN 'dup' ELSE 'ingested' END AS lane
  FROM good g JOIN wmv w ON g.b = w.b
  UNION ALL
  SELECT b, CASE WHEN m13 = 0 THEN 'drifted' WHEN m13 = 1 THEN 'malformed'
                 ELSE 'gate_volume' END
  FROM w1 WHERE m13 IN (0, 1, 2)
)
SELECT b AS batch_id, lane, CAST(count(*) AS BIGINT) AS n
FROM lanes GROUP BY 1, 2""",

    // ANN staleness telemetry: counts are 4/5-5/5 split arithmetic; the
    // same-distribution increment must NOT trip either drift axis.
    "q237_ann_staleness" ->
      """SELECT CAST(16 AS BIGINT) AS n_cells,
  (SELECT CAST(count(*) AS BIGINT) FROM embeddings WHERE vec_id % 5 <> 0) AS n_base,
  (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_now,
  true AS psi_ok, true AS sim_ok, false AS refit_due""",

    // embedding-diversity quota sample: the X74 md5-hyperplane bucket
    // family replicated term-for-term (integer-quantized projection
    // terms, order-free sums -> engine-identical bucket ids), then the
    // q67 md5-uniform rank within each bucket.
    "q234_diversity_sample" ->
      """WITH b AS (
  SELECT vec_id,
    (CASE WHEN list_sum(list_transform(range(1, 65), i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * ((CAST(('0x' || substr(md5('divq:0:' || i), 1, 15)) AS BIGINT) / 1152921504606846976.0) - 0.5) * 1000000.0 + 0.5) AS BIGINT))) > 0 THEN 1 ELSE 0 END) + (CASE WHEN list_sum(list_transform(range(1, 65), i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * ((CAST(('0x' || substr(md5('divq:1:' || i), 1, 15)) AS BIGINT) / 1152921504606846976.0) - 0.5) * 1000000.0 + 0.5) AS BIGINT))) > 0 THEN 2 ELSE 0 END) + (CASE WHEN list_sum(list_transform(range(1, 65), i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * ((CAST(('0x' || substr(md5('divq:2:' || i), 1, 15)) AS BIGINT) / 1152921504606846976.0) - 0.5) * 1000000.0 + 0.5) AS BIGINT))) > 0 THEN 4 ELSE 0 END) + (CASE WHEN list_sum(list_transform(range(1, 65), i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * ((CAST(('0x' || substr(md5('divq:3:' || i), 1, 15)) AS BIGINT) / 1152921504606846976.0) - 0.5) * 1000000.0 + 0.5) AS BIGINT))) > 0 THEN 8 ELSE 0 END) AS bucket
  FROM embeddings
), ranked AS (
  SELECT vec_id, bucket,
    row_number() OVER (PARTITION BY bucket ORDER BY
      CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)
        / 1152921504606846976.0, vec_id) AS rk
  FROM b
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE WHEN rk <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(sum(CASE WHEN rk <= 20 THEN vec_id ELSE 0 END) AS BIGINT) AS kept_id_sum
FROM ranked GROUP BY 1""",

    // self-healing bar feed: q230's reconciliation chain + the healing
    // policy as a projection; content checksums are exact integers
    // (volume longs; prices half-up-quantized to cents BEFORE summing).
    "q233_healed_bars" ->
      """WITH g AS (
  SELECT user_id, epoch_us(ts) // 300000000 AS bucket,
    CAST(count(*) AS BIGINT) AS volume, max(value) AS price
  FROM events GROUP BY 1, 2
), h AS (
  SELECT *, (user_id + bucket) % 1000 AS hh FROM g
), bars AS (
  SELECT user_id, bucket,
    CASE WHEN hh % 13 = 0 THEN volume + 7 ELSE volume END AS bar_volume,
    CASE WHEN hh % 17 = 0 THEN price + 5.0 ELSE price END AS bar_price
  FROM h WHERE hh % 11 <> 0
  UNION ALL
  SELECT user_id, bucket + 10000000, volume, price FROM h WHERE hh % 19 = 0
), r AS (
  SELECT b.bar_volume, b.bar_price, g.volume AS tv, g.price AS tp,
    CASE WHEN b.bar_volume IS NULL THEN 'missing_in_bars'
         WHEN g.volume IS NULL THEN 'missing_in_trades'
         WHEN b.bar_volume <> g.volume THEN 'volume_mismatch'
         WHEN abs(b.bar_price - g.price) > 0.5 THEN 'price_mismatch'
         ELSE 'ok' END AS lane
  FROM bars b FULL OUTER JOIN g
    ON b.user_id = g.user_id AND b.bucket = g.bucket
), healed AS (
  SELECT
    CASE WHEN lane = 'ok' THEN 'kept_bar'
         WHEN lane = 'missing_in_bars' THEN 'backfilled'
         WHEN lane = 'missing_in_trades' THEN 'dropped_phantom'
         ELSE 'overridden' END AS action,
    CASE WHEN lane = 'ok' THEN bar_volume
         WHEN lane = 'missing_in_trades' THEN NULL
         ELSE tv END AS volume,
    CASE WHEN lane = 'ok' THEN bar_price
         WHEN lane = 'missing_in_trades' THEN NULL
         ELSE tp END AS price
  FROM r
)
SELECT action, CAST(count(*) AS BIGINT) AS n,
  CAST(COALESCE(sum(volume), 0) AS BIGINT) AS volume_sum,
  CAST(COALESCE(sum(CAST(floor(price * 100 + 0.5) AS BIGINT)), 0) AS BIGINT)
    AS price_cents
FROM healed GROUP BY 1""",

    // late-data lanes: the sink's watermark replica is pure arithmetic —
    // wm before batch b = running max over batches < b of (batch-max
    // event-time ms) - 30 days; a row is late iff its event time is
    // below that. Batches are o_orderkey mod 3, so every lane count and
    // key sum is predictable without running a stream.
    "q229_late_lanes" ->
      """WITH r AS (
  SELECT o_orderkey AS k, CAST(o_orderdate AS TIMESTAMP) AS ts,
    o_orderkey % 3 AS b
  FROM orders
), mx AS (
  SELECT b, max(epoch_ms(ts)) AS mts FROM r GROUP BY b
), wmv AS (
  SELECT b, max(mts) OVER (ORDER BY b
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 2592000000 AS wm
  FROM mx
), lanes AS (
  SELECT r.k, r.b,
    CASE WHEN w.wm IS NOT NULL AND epoch_ms(r.ts) < w.wm THEN 'late'
         ELSE 'on_time' END AS lane
  FROM r JOIN wmv w ON r.b = w.b
)
SELECT b AS batch_id, lane, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(k) AS BIGINT) AS key_sum
FROM lanes GROUP BY 1, 2""",

    "q42_range_join" ->
      """SELECT e.event_id, e.user_id, count(c.event_id) AS n_clicks_5m
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = e.user_id
 AND c.ts > e.ts - INTERVAL '5 minutes'
 AND c.ts <= e.ts
GROUP BY e.event_id, e.user_id""",

    "q44_subword_tokens" ->
      """SELECT lang, count(*) AS n_docs,
  CAST(sum(nsub) AS BIGINT) AS total_subwords
FROM (
  SELECT lang,
    list_sum(list_transform(
      list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0),
      w -> CAST(ceil(len(w) / 4.0) AS BIGINT))) AS nsub
  FROM documents
)
GROUP BY lang""",

    "q45_predicates" ->
      """SELECT c_custkey, c_name, c_mktsegment, round(c_acctbal, 2) AS bal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
  AND c_name LIKE '%1%'
  AND c_acctbal BETWEEN 0 AND 8000""",

    "q46_scalar_funcs" ->
      """SELECT o_orderkey,
  year(o_orderdate) AS y,
  month(o_orderdate) AS m,
  day(o_orderdate) AS d,
  date_trunc('month', o_orderdate) AS month_start,
  upper(o_orderpriority) AS prio_upper,
  concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
  length(o_orderpriority) AS prio_len,
  substr(o_orderpriority, 1, 3) AS prio3,
  regexp_extract(o_orderpriority, '(\d)', 1) AS prio_num,
  round(ln(o_totalprice), 6) AS ln_price,
  round(sqrt(o_totalprice), 6) AS sqrt_price,
  round(abs(-o_totalprice), 2) AS abs_price
FROM orders""",

    "q47_multiset_ops" ->
      """SELECT l_partkey, 'intersect_all' AS op FROM (
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
  INTERSECT ALL
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')
UNION ALL
SELECT l_partkey, 'except_all' AS op FROM (
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
  EXCEPT ALL
  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A')""",

    "q48_ranking_windows" ->
      """SELECT o_orderkey, o_orderstatus,
  ntile(4) OVER w AS quartile,
  floor((percent_rank() OVER w) * 1000000 + 0.5) / 1000000 AS pr,
  floor((cume_dist() OVER w) * 1000000 + 0.5) / 1000000 AS cd,
  dense_rank() OVER w AS dr
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)""",

    "q49_value_windows" ->
      """SELECT o_orderkey, o_orderstatus,
  round(first_value(o_totalprice) OVER w, 2) AS cheapest,
  round(last_value(o_totalprice) OVER w, 2) AS priciest,
  round(nth_value(o_totalprice, 2) OVER w, 2) AS second_cheapest
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",

    "q50_ingest_bars" ->
      """SELECT
  sha256(concat('T', o_custkey % 100, '|', CAST(o_orderdate AS VARCHAR))) AS id,
  o_orderdate AS datetime,
  CAST(o_totalprice AS FLOAT) AS open,
  CAST(o_totalprice * 1.01 AS FLOAT) AS high,
  CAST(o_totalprice * 0.99 AS FLOAT) AS low,
  CAST(o_totalprice AS FLOAT) AS close,
  CAST(o_totalprice AS FLOAT) AS adj_close,
  CAST(o_orderkey % 1000 + 1 AS INTEGER) AS volume,
  CAST(0.0 AS FLOAT) AS dividends,
  CAST(0.0 AS FLOAT) AS stock_splits,
  concat('T', o_custkey % 100) AS ticker
FROM orders
WHERE o_orderkey % 1000 + 1 > 0""",

    "q51_ingest_trades" ->
      """SELECT
  concat(l_returnflag, ',', l_linestatus) AS trade_conditions,
  CAST(l_extendedprice AS FLOAT) AS last_price,
  concat('S', l_suppkey) AS symbol,
  CAST(l_shipdate AS TIMESTAMP) AS datetime,
  l_linenumber AS volume
FROM lineitem
WHERE l_linenumber > 0""",

    "q52_full_outer_join" ->
      """WITH buys AS (SELECT user_id AS bu, count(*) AS n_buys FROM events
  WHERE event_type = 'purchase' GROUP BY user_id),
errs AS (SELECT user_id AS eu, count(*) AS n_errors FROM events
  WHERE event_type = 'error' GROUP BY user_id)
SELECT coalesce(bu, eu) AS user_id,
  coalesce(n_buys, 0) AS n_buys,
  coalesce(n_errors, 0) AS n_errors
FROM buys FULL OUTER JOIN errs ON bu = eu""",

    "q53_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation""",

    "q54_unpivot" ->
      """SELECT p_partkey, 'size' AS attribute, round(CAST(p_size AS DOUBLE), 2) AS value FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS attribute, round(p_retailprice, 2) AS value FROM part""",

    "q55_array_funcs" ->
      """SELECT vec_id,
  len(embedding) AS dim,
  round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
  array_to_string(
    list_transform(
      list_sort(list_transform(embedding[1:4], x -> round(CAST(x AS DOUBLE), 6))),
      x -> CAST(round(x * 1000000) AS BIGINT)), ',') AS sorted_head
FROM embeddings""",

    "q56_conditionals" ->
      """SELECT
  CASE WHEN l_discount >= 0.08 THEN 'high'
       WHEN l_discount >= 0.04 THEN 'mid'
       ELSE 'low' END AS disc_band,
  coalesce(nullif(l_returnflag, 'N'), 'none') AS flag,
  count(*) AS n
FROM lineitem
GROUP BY 1, 2""",

    "q57_subqueries" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
FROM orders o
WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
  AND EXISTS (SELECT 1 FROM orders i
              WHERE i.o_custkey = o.o_custkey AND i.o_orderkey <> o.o_orderkey)""",

    // Cutler RSI-14: lag diff -> explicit CASE gain/loss (null on the
    // first row of a series, so avg excludes it in both engines) ->
    // trailing-14 frame averages -> 100*ag/(ag+al), flat series pinned
    // to 50. Same floor-rounding as the engine.
    "q76_rsi" ->
      """WITH d AS (
  SELECT event_id, user_id, ts, value,
    value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS diff
  FROM events
), g AS (
  SELECT event_id, user_id,
    avg(CASE WHEN diff IS NULL THEN NULL WHEN diff > 0.0 THEN diff ELSE 0.0 END)
      OVER f AS ag,
    avg(CASE WHEN diff IS NULL THEN NULL WHEN diff < 0.0 THEN -diff ELSE 0.0 END)
      OVER f AS al
  FROM d
  WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
  CASE WHEN ag IS NULL OR al IS NULL THEN NULL
       WHEN ag + al = 0.0 THEN 50.0
       ELSE floor((100.0 * ag / (ag + al)) * 1000000 + 0.5) / 1000000 END AS rsi14
FROM g""",

    "q77_drawdown" ->
      """WITH p AS (
  SELECT user_id, value,
    max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rmax
  FROM events WHERE value > 0
)
SELECT user_id,
  floor(min(value / rmax - 1.0) * 1000000 + 0.5) / 1000000 AS max_drawdown,
  floor(max(rmax) * 1000000 + 0.5) / 1000000 AS peak
FROM p GROUP BY user_id""",

    "q78_bollinger" ->
      """WITH b AS (
  SELECT event_id, user_id, value,
    avg(value) OVER f AS ma,
    stddev_samp(value) OVER f AS sd
  FROM events
  WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
  floor(ma * 1000000 + 0.5) / 1000000 AS mid,
  floor((ma + 2.0 * sd) * 1000000 + 0.5) / 1000000 AS upper,
  floor((ma - 2.0 * sd) * 1000000 + 0.5) / 1000000 AS lower,
  CASE WHEN sd IS NULL OR sd = 0.0 THEN NULL
       ELSE floor(((value - (ma - 2.0 * sd)) / (2.0 * 2.0 * sd)) * 1000000 + 0.5) / 1000000
  END AS pct_b
FROM b""",

    "q79_series_corr" ->
      """WITH daily AS (
  SELECT CAST(ts AS DATE) AS bucket, event_type AS series, avg(value) AS v
  FROM events GROUP BY 1, 2
)
SELECT a.series AS series_a, b.series AS series_b,
  floor(corr(a.v, b.v) * 1000000 + 0.5) / 1000000 AS r, count(*) AS n_buckets
FROM daily a JOIN daily b ON a.bucket = b.bucket AND a.series < b.series
GROUP BY 1, 2""",

    // C4-style boilerplate: per-doc DISTINCT word trigrams -> 60-bit md5
    // keys -> document frequency -> df >= |docs|/50 is boilerplate ->
    // per-doc overlap. Same gram contract as q70/q71 (lower, \s+ split).
    "q80_boilerplate" ->
      """WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r
), keys AS (
  SELECT doc_id, CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT) AS gram_key
  FROM grams
), dfreq AS (
  SELECT gram_key, count(*) AS df FROM keys GROUP BY gram_key
), boiler AS (
  SELECT gram_key FROM dfreq
  WHERE df >= (SELECT count(*) // 50 FROM documents)
)
SELECT k.doc_id, count(*) AS n_grams, count(b.gram_key) AS n_boiler,
  floor((CAST(count(b.gram_key) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS boiler_frac
FROM keys k LEFT JOIN boiler b ON k.gram_key = b.gram_key
GROUP BY k.doc_id""",

    // tolerance as-of: native ASOF pick, then the staleness bound nulls
    // the payload (pandas merge_asof(tolerance) semantics)
    "q117_asof_tolerance" ->
      """SELECT p.event_id, p.user_id, p.ts, round(p.value, 4) AS value,
  CASE WHEN v.ts IS NOT NULL AND epoch_us(p.ts) - epoch_us(v.ts) <= 600000000
       THEN v.ts END AS view_ts,
  CASE WHEN v.ts IS NOT NULL AND epoch_us(p.ts) - epoch_us(v.ts) <= 600000000
       THEN round(v.value, 4) END AS view_value,
  CASE WHEN v.ts IS NOT NULL AND epoch_us(p.ts) - epoch_us(v.ts) <= 600000000
       THEN CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) END AS lag_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts""",

    // resample + forward fill: full 5-minute grid per key, holes carry
    // the latest earlier close via the portable run-partition fill
    "q116_resample_ffill" ->
      """WITH c AS (
  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
    arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2
), b AS (
  SELECT event_type, min(bucket_start) AS mn, max(bucket_start) AS mx FROM c GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 5 MINUTE)) AS bucket_start
  FROM b
), j AS (
  SELECT g.event_type, g.bucket_start, c.close
  FROM grid g LEFT JOIN c
    ON g.event_type = c.event_type AND g.bucket_start = c.bucket_start
), runs AS (
  SELECT event_type, bucket_start, close,
    count(close) OVER (PARTITION BY event_type ORDER BY bucket_start
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM j
)
SELECT event_type, bucket_start, round(close, 4) AS close,
  round(max(close) OVER (PARTITION BY event_type, run), 4) AS ffill,
  CAST(close IS NULL AS INT) AS is_gap
FROM runs""",

    // rolling z-score anomalies: prior-n frame, null z in warm-up/flat,
    // null-safe flag
    "q122_anomaly_zscore" ->
      """SELECT event_id, user_id,
  CASE WHEN sd IS NULL OR sd = 0 THEN NULL
       ELSE floor(((value - ma) / sd) * 1000000 + 0.5) / 1000000 END AS z,
  COALESCE(CAST(abs(CASE WHEN sd IS NULL OR sd = 0 THEN NULL
       ELSE floor(((value - ma) / sd) * 1000000 + 0.5) / 1000000 END) > 3.0 AS INT), 0) AS is_anomaly
FROM (
  SELECT event_id, user_id, value,
    avg(value) OVER w AS ma,
    stddev_samp(value) OVER w AS sd
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)""",

    // capstone v2: gopher gate -> exact dedup vs kept history ->
    // decontaminate -> mixture; same fragments as q118/q109/q70/q81
    "q121_curation_v2" ->
      (s"""WITH m AS (
  SELECT doc_id, text,
    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS ntok,
    len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0)) AS ltok,
    len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
        x -> list_contains(['the','a','and','of','to'], x))) AS sw,
    length(text) AS lc,
    length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
  FROM documents
), gtoks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS t
  FROM documents
), ggrams AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS gram
  FROM gtoks, LATERAL (SELECT unnest(range(1, len(t))) AS i) r
), ggc AS (
  SELECT doc_id, gram, count(*) AS c FROM ggrams GROUP BY 1, 2
), grep AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
    CAST(COALESCE(sum(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS dup
  FROM ggc GROUP BY doc_id
), keepids AS (
  SELECT m.doc_id
  FROM m LEFT JOIN grep r ON m.doc_id = r.doc_id
  WHERE NOT (m.ntok < 20 OR m.ntok > 100000)
    AND (CAST(m.lc AS DOUBLE) / greatest(CAST(m.ntok AS DOUBLE), 1.0) BETWEEN 3.0 AND 10.0)
    AND (CAST(m.sw AS DOUBLE) / greatest(CAST(m.ltok AS DOUBLE), 1.0) >= 0.05)
    AND NOT (r.doc_id IS NOT NULL AND r.n_grams > 0
             AND CAST(r.dup AS DOUBLE) / CAST(r.n_grams AS DOUBLE) > 0.3)
    AND (CAST(m.np AS DOUBLE) / greatest(CAST(m.lc AS DOUBLE), 1.0) <= 0.2)
), kept AS (
  SELECT d.* FROM documents d JOIN keepids k ON d.doc_id = k.doc_id
), h AS (
  SELECT DISTINCT sha256(text) AS ch FROM kept WHERE $oldSrcPred
), freshd AS (
  SELECT i.* FROM (SELECT * FROM kept WHERE NOT ($oldSrcPred)) i
  LEFT JOIN h ON sha256(i.text) = h.ch WHERE h.ch IS NULL
), ctoks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS t
  FROM freshd
), cgrams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS gram
  FROM ctoks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i) r
), btoks AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS t
  FROM documents WHERE source = 'src0'
), bgrams AS (
  SELECT DISTINCT array_to_string(t[i:i+4], ' ') AS gram
  FROM btoks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i) r
), contaminated AS (
  SELECT c.doc_id FROM cgrams c JOIN bgrams b USING (gram)
  GROUP BY c.doc_id HAVING count(*) >= 2
), clean AS (
  SELECT * FROM freshd WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
), toks2 AS (
  SELECT doc_id, source,
    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS ntok
  FROM clean
), tot AS (
  SELECT source, CAST(sum(ntok) AS BIGINT) AS toks,
    CAST(CASE WHEN source IN ('src10', 'src11', 'src12') THEN 3.0 ELSE 1.0 END AS DOUBLE) AS w
  FROM toks2 GROUP BY source
), rates AS (
  SELECT source,
    CASE WHEN toks = 0 THEN 1.0
         ELSE LEAST(1.0, CAST(0.3 AS DOUBLE) * CAST((SELECT sum(toks) FROM tot) AS DOUBLE) * w
           / CAST((SELECT sum(w) FROM tot) AS DOUBLE) / CAST(toks AS DOUBLE)) END AS rate
  FROM tot
)
SELECT t.source, count(*) AS n_docs, CAST(sum(t.ntok) AS BIGINT) AS n_tokens
FROM toks2 t JOIN rates r ON t.source = r.source
WHERE CAST(('0x' || substr(md5(COALESCE(CAST(t.doc_id AS VARCHAR), chr(0) || 'graft-null-id')), 1, 15)) AS BIGINT)
        / 1152921504606846976.0 < r.rate
GROUP BY t.source"""),

    // TWAP: piecewise-constant interpolation — weight = integer-micros
    // gap to the next observation; last row weight 0; 1-row day
    // degrades to its value (the raw avg)
    "q120_twap" ->
      """WITH g AS (
  SELECT event_type, CAST(ts AS DATE) AS day, value,
    CAST(lead(epoch_us(ts)) OVER (PARTITION BY event_type, CAST(ts AS DATE)
      ORDER BY ts, event_id) - epoch_us(ts) AS DOUBLE) AS dt
  FROM events
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, count(*) AS n,
  floor(avg(value) * 1000000 + 0.5) / 1000000 AS simple_avg,
  floor((CASE WHEN COALESCE(sum(dt), 0) > 0 THEN sum(value * dt) / sum(dt)
              ELSE avg(value) END) * 1000000 + 0.5) / 1000000 AS twap
FROM g GROUP BY event_type, day""",

    // rolling WAU: sliding-frame count-distinct via the contribution
    // inversion; observed-days join bounds the grid
    "q119_rolling_wau" ->
      """WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), obs AS (
  SELECT DISTINCT d FROM ud
), contrib AS (
  SELECT user_id, d + CAST(o AS INTEGER) AS day
  FROM ud, LATERAL (SELECT unnest(range(0, 7)) AS o) r
)
SELECT strftime(c.day, '%Y-%m-%d') AS day, count(DISTINCT c.user_id) AS n_active
FROM contrib c JOIN obs ON c.day = obs.d
GROUP BY 1""",

    // Gopher-style quality filter: every signal is a single
    // integer-ratio division (bit-identical across engines); the dup
    // fraction reuses q71's bigram construction
    "q118_gopher_filter" ->
      """WITH m AS (
  SELECT doc_id, text,
    CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS ntok,
    len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0)) AS ltok,
    len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        x -> list_contains(['the','a','and','of','to'], x))) AS sw,
    length(text) AS lc,
    length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
  FROM documents
), toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
  FROM documents
), grams AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) r
), gc AS (
  SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2
), rep AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
    CAST(COALESCE(sum(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS dup
  FROM gc GROUP BY doc_id
), flags AS (
  SELECT m.doc_id, m.ntok,
    (CASE WHEN m.ntok < 20 OR m.ntok > 100000 THEN 1 ELSE 0 END)
    + (CASE WHEN NOT (CAST(m.lc AS DOUBLE) / greatest(CAST(m.ntok AS DOUBLE), 1.0)
            BETWEEN 3.0 AND 10.0) THEN 2 ELSE 0 END)
    + (CASE WHEN CAST(m.sw AS DOUBLE) / greatest(CAST(m.ltok AS DOUBLE), 1.0) < 0.05
            THEN 4 ELSE 0 END)
    + (CASE WHEN r.doc_id IS NOT NULL AND r.n_grams > 0
            AND CAST(r.dup AS DOUBLE) / CAST(r.n_grams AS DOUBLE) > 0.3
            THEN 8 ELSE 0 END)
    + (CASE WHEN CAST(m.np AS DOUBLE) / greatest(CAST(m.lc AS DOUBLE), 1.0) > 0.2
            THEN 16 ELSE 0 END) AS reasons
  FROM m LEFT JOIN rep r ON m.doc_id = r.doc_id
)
SELECT doc_id, ntok AS n_tokens, reasons,
  CAST(reasons = 0 AS INT) AS keep
FROM flags""",

    // per-source entropy + TTR: q94's entropy construction keyed by
    // source, plus the distinct/total ratio
    "q115_source_entropy" ->
      """WITH counts AS (
  SELECT source, tok, count(*) AS c FROM (
    SELECT source,
      unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS tok
    FROM documents) GROUP BY 1, 2
), t AS (
  SELECT source, c, sum(c) OVER (PARTITION BY source) AS tot FROM counts
)
SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
  floor((CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS ttr,
  floor((-sum((CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))
    * ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE)))) * 1000000 + 0.5) / 1000000 AS entropy
FROM t GROUP BY source""",

    // Zipf profile: token frequencies, top-30 by (count desc, token),
    // cumulative coverage against the independent total-token scan
    "q114_zipf_profile" ->
      """WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS tok
  FROM documents
), tf AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok
), top AS (
  SELECT tok, c FROM tf ORDER BY c DESC, tok LIMIT 30
), ranked AS (
  SELECT tok, c, CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rank,
    sum(c) OVER (ORDER BY c DESC, tok ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM top
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM toks
)
SELECT rank, tok, c, CAST(rank * c AS BIGINT) AS rank_x_c,
  floor(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE) * 1000000 + 0.5) / 1000000 AS cum_frac
FROM ranked, tot""",

    // cross-source containment: distinct (source, gram) pairs joined on
    // the 60-bit gram key across sources
    "q113_source_overlap" ->
      """WITH toks AS (
  SELECT source,
    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
  FROM documents
), g AS (
  SELECT DISTINCT source AS src,
    CAST(('0x' || substr(md5(array_to_string(t[i:i+2], ' ')), 1, 15)) AS BIGINT) AS gram_key
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r
), tot AS (
  SELECT src, count(*) AS n_a FROM g GROUP BY src
), p AS (
  SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_shared
  FROM g a JOIN g b ON a.gram_key = b.gram_key AND a.src <> b.src
  GROUP BY 1, 2
)
SELECT p.src_a, p.src_b, p.n_shared, t.n_a,
  floor(CAST(p.n_shared AS DOUBLE) / CAST(t.n_a AS DOUBLE) * 1000000 + 0.5) / 1000000 AS containment
FROM p JOIN tot t ON p.src_a = t.src""",

    // positional boilerplate coverage: occurrences of boilerplate grams
    // expand to spanned positions, deduped per (doc, position)
    "q111_boiler_coverage" ->
      """WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
  FROM documents
), occ AS (
  SELECT doc_id, i AS pos,
    CAST(('0x' || substr(md5(array_to_string(t[i:i+2], ' ')), 1, 15)) AS BIGINT) AS gram_key
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r
), dfreq AS (
  SELECT gram_key, count(DISTINCT doc_id) AS df FROM occ GROUP BY gram_key
), boiler AS (
  SELECT gram_key FROM dfreq
  WHERE df >= (SELECT count(*) // 50 FROM documents)
), cov AS (
  SELECT DISTINCT o.doc_id, o.pos + off AS p
  FROM occ o JOIN boiler b ON o.gram_key = b.gram_key,
    LATERAL (SELECT unnest(range(0, 3)) AS off) u
), covn AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_covered FROM cov GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
  COALESCE(c.n_covered, 0) AS n_covered,
  CAST(len(t.t) AS BIGINT) - COALESCE(c.n_covered, 0) AS clean_tokens,
  CASE WHEN len(t.t) = 0 THEN 0.0
       ELSE floor(CAST(COALESCE(c.n_covered, 0) AS DOUBLE) / CAST(len(t.t) AS DOUBLE)
         * 1000000 + 0.5) / 1000000 END AS cover_frac
FROM toks t LEFT JOIN covn c ON t.doc_id = c.doc_id""",

    // source-mixture sampling: rate = min(1, 0.3 * T * w / W / toks),
    // exact BIGINT token sums, double arithmetic in the engine's exact
    // operation order, md5-uniform membership
    "q81_mixture_sample" ->
      """WITH toks AS (
  SELECT doc_id, source,
    CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS ntok
  FROM documents
), tot AS (
  SELECT source, CAST(sum(ntok) AS BIGINT) AS toks,
    CAST(CASE WHEN source IN ('src0', 'src1', 'src2') THEN 3.0 ELSE 1.0 END AS DOUBLE) AS w
  FROM toks GROUP BY source
), rates AS (
  SELECT source,
    CASE WHEN toks = 0 THEN 1.0
         ELSE LEAST(1.0, CAST(0.3 AS DOUBLE) * CAST((SELECT sum(toks) FROM tot) AS DOUBLE) * w
           / CAST((SELECT sum(w) FROM tot) AS DOUBLE) / CAST(toks AS DOUBLE)) END AS rate
  FROM tot
)
SELECT t.source, count(*) AS n_docs, CAST(sum(t.ntok) AS BIGINT) AS n_tokens
FROM toks t JOIN rates r ON t.source = r.source
WHERE CAST(('0x' || substr(md5(COALESCE(CAST(t.doc_id AS VARCHAR), chr(0) || 'graft-null-id')), 1, 15)) AS BIGINT)
        / 1152921504606846976.0 < r.rate
GROUP BY t.source""",

    // incremental cross-corpus near-dedup: new sources' bands joined
    // against the kept corpus's bands — same construction as q22
    "q89_incremental_dedup" -> q89IncrementalSql,

    "q100_curation_extended" -> q100CurationExtendedSql,

    "q103_macd" -> q103MacdSql,

    // Markov transition matrix: lag pairs per user, counts aggregated
    // BEFORE the tiny normalizing window
    "q108_transition_matrix" ->
      """WITH g AS (
  SELECT event_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), c AS (
  SELECT prev_type, event_type, count(*) AS n
  FROM g WHERE prev_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, event_type, n,
  floor(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE)
    * 1000000 + 0.5) / 1000000 AS prob
FROM c""",

    // Bloom-gated incremental dedup: the bloom only changes the PLAN —
    // the oracle is the plain exact content-digest membership join
    "q109_bloom_gated_dedup" ->
      (s"""WITH h AS (
  SELECT DISTINCT sha256(text) AS ch FROM documents WHERE $oldSrcPred
), i AS (
  SELECT source, sha256(text) AS ch FROM documents WHERE NOT ($oldSrcPred)
)
SELECT i.source, count(*) AS n_docs,
  CAST(sum(CASE WHEN h.ch IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
  CAST(sum(CASE WHEN h.ch IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_dup
FROM i LEFT JOIN h ON i.ch = h.ch
GROUP BY i.source"""),

    // session path mining: q91's session index feeding double-lag
    // trigrams within (user, session), global top-20
    "q110_session_paths" ->
      """WITH g AS (
  SELECT user_id, ts, event_id, event_type,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
), s AS (
  SELECT user_id, ts, event_id, event_type,
    sum(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM g
), tri AS (
  SELECT
    lag(event_type, 2) OVER w AS t1,
    lag(event_type, 1) OVER w AS t2,
    event_type AS t3
  FROM s
  WINDOW w AS (PARTITION BY user_id, session_idx ORDER BY ts, event_id)
)
SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS n
FROM tri WHERE t1 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path LIMIT 20""",

    // Donchian breakouts: prior-20-bar high (frame shifted one bar back),
    // per-series event counts
    "q107_breakouts" ->
      """WITH c AS (
  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
    max(value) AS high, arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2
), b AS (
  SELECT event_type, bucket_start, close,
    max(high) OVER (PARTITION BY event_type ORDER BY bucket_start
      ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS ph
  FROM c
), f AS (
  SELECT event_type, bucket_start,
    CAST(ph IS NOT NULL AND close > ph AS INT) AS brk
  FROM b
)
SELECT event_type, CAST(sum(brk) AS BIGINT) AS n_breakouts,
  max(CASE WHEN brk = 1 THEN bucket_start END) AS last_breakout,
  count(*) AS n_bars
FROM f GROUP BY event_type""",

    // novelty rate: q89's cross-corpus candidate join aggregated to a
    // per-source monitoring statistic
    "q106_novelty_rate" ->
      (s"""WITH ${minhashBandsCteOver("o", s"(SELECT * FROM documents WHERE $oldSrcPred)")},
${minhashBandsCteOver("n", s"(SELECT * FROM documents WHERE NOT ($oldSrcPred))")},
dups AS (
  SELECT DISTINCT n.doc_id
  FROM bands_n n JOIN bands_o o
    ON n.band_idx = o.band_idx AND n.band_hash = o.band_hash
)
SELECT d.source, count(*) AS n_docs,
  count(x.doc_id) AS n_dups,
  floor((1.0 - CAST(count(x.doc_id) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS novelty_rate
FROM (SELECT * FROM documents WHERE NOT ($oldSrcPred)) d
LEFT JOIN dups x ON d.doc_id = x.doc_id
GROUP BY d.source"""),

    // contrastive mining: q65's scoring with an extra (query, label-match)
    // ranking partition
    "q104_contrastive" ->
      """WITH qv AS (
  SELECT vec_id AS qid, embedding AS qe, label AS qlbl FROM embeddings WHERE vec_id < 5
), scored AS (
  SELECT qv.qid,
    CAST(e.label = qv.qlbl AS INT) AS same_label,
    e.vec_id AS id,
    floor((
      list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.qe[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform(qv.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) * 1000000 + 0.5) / 1000000 AS score
  FROM embeddings e, qv
  WHERE e.vec_id <> qv.qid
)
SELECT qid, same_label, id, score FROM (
  SELECT qid, same_label, id, score,
    row_number() OVER (PARTITION BY qid, same_label ORDER BY score DESC, id) AS rn
  FROM scored) WHERE rn <= 5""",

    // OBV over the q17 candles: sign of close change x candle volume,
    // running total per series
    "q105_obv" ->
      """WITH c AS (
  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
    arg_max(value, event_id) AS close, sum(value) AS volume
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, bucket_start, volume,
    sign(close - lag(close) OVER (PARTITION BY event_type ORDER BY bucket_start)) AS dir
  FROM c
)
SELECT event_type, bucket_start,
  floor((sum(COALESCE(dir, 0.0) * volume) OVER (PARTITION BY event_type ORDER BY bucket_start
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 1000000 + 0.5) / 1000000 AS obv
FROM d""",

    // ATR-14 over the q17 candle construction: CASE on the missing lag
    // (first bar = high-low), trailing-14 average
    "q101_atr" ->
      """WITH c AS (
  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
    max(value) AS high, min(value) AS low, arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2
), tr AS (
  SELECT event_type, bucket_start, high, low,
    lag(close) OVER (PARTITION BY event_type ORDER BY bucket_start) AS pc
  FROM c
), t2 AS (
  SELECT event_type, bucket_start,
    CASE WHEN pc IS NULL THEN high - low
         ELSE greatest(high - low, abs(high - pc), abs(low - pc)) END AS tr
  FROM tr
)
SELECT event_type, bucket_start,
  floor((avg(tr) OVER (PARTITION BY event_type ORDER BY bucket_start
    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)) * 1000000 + 0.5) / 1000000 AS atr14
FROM t2""",

    // stochastic %K(14) over the same candles, degenerate range -> null
    "q102_stochastic" ->
      """WITH c AS (
  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
    max(value) AS high, min(value) AS low, arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2
), b AS (
  SELECT event_type, bucket_start, close,
    min(low) OVER f AS ll, max(high) OVER f AS hh
  FROM c
  WINDOW f AS (PARTITION BY event_type ORDER BY bucket_start
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT event_type, bucket_start,
  CASE WHEN hh > ll
       THEN floor((100.0 * (close - ll) / (hh - ll)) * 1000000 + 0.5) / 1000000
       ELSE NULL END AS pct_k
FROM b""",

    // beta to benchmark: covar/var over day-aligned means, division
    // guarded on zero benchmark variance
    "q99_beta" ->
      """WITH s AS (
  SELECT CAST(ts AS DATE) AS bucket, user_id, avg(value) AS v
  FROM events GROUP BY 1, 2
), m AS (
  SELECT CAST(ts AS DATE) AS bucket, avg(value) AS m FROM events GROUP BY 1
), j AS (
  SELECT s.user_id, s.v, m.m FROM s JOIN m ON s.bucket = m.bucket
)
SELECT user_id,
  CASE WHEN var_samp(m) > 0.0
       THEN floor((covar_samp(v, m) / var_samp(m)) * 1000000 + 0.5) / 1000000
       ELSE NULL END AS beta,
  count(*) AS n_buckets
FROM j GROUP BY user_id""",

    // trigram histogram (generator path): q70's gram contract + count
    "q98_gram_histogram" ->
      """WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
  FROM documents
), grams AS (
  SELECT array_to_string(t[i:i+2], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r
)
SELECT gram, count(*) AS n FROM grams GROUP BY gram
ORDER BY n DESC, gram LIMIT 50""",

    // exact heavy hitters: the oracle computes the full vocabulary count
    // (the engine's Misra-Gries candidates + recount must equal it)
    "q97_heavy_hitters" ->
      """WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS tok
  FROM documents
), tf AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM toks
)
SELECT tok, c FROM tf, tot WHERE c * 40 > n""",

    // rolling trend: windowed corr(value, time-rank), same frame
    "q96_rolling_trend" ->
      """WITH r AS (
  SELECT event_id, user_id, ts, value,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS rn
  FROM events
)
SELECT event_id, user_id,
  floor((corr(value, rn) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) * 1000000 + 0.5) / 1000000 AS trend
FROM r""",

    // blocked fuzzy matching: same (nation, 16-char-prefix) blocking and
    // the same unit-cost edit distance
    "q95_fuzzy_match" ->
      """WITH k AS (
  SELECT c_custkey AS id, c_name AS name,
    concat_ws('|', c_nationkey, substr(c_name, 1, 16)) AS block
  FROM customer
)
SELECT a.id AS id_a, b.id AS id_b, CAST(levenshtein(a.name, b.name) AS INT) AS dist
FROM k a JOIN k b ON a.block = b.block AND a.id < b.id
WHERE levenshtein(a.name, b.name) <= 2""",

    // Efraimidis-Spirakis weighted sample: key = u^(1/w) from the same
    // md5-uniform as q67/q75. CAVEAT: pow is not correctly rounded in
    // either libm, so two keys within ~1 ulp could order differently
    // across engines at the rank-k boundary — accepted: u is a 60-bit
    // uniform, so near-ties are ~2^-50 events; verified stable at both
    // harness scales
    "q93_weighted_sample" ->
      """WITH ranked AS (
  SELECT doc_id, lang, row_number() OVER (
    PARTITION BY lang
    ORDER BY POWER(
      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        / 1152921504606846976.0,
      1.0 / CAST(n_chars AS DOUBLE)) DESC,
    doc_id) AS rk
  FROM documents
)
SELECT doc_id, lang FROM ranked WHERE rk <= 20""",

    "q94_token_entropy" ->
      """WITH counts AS (
  SELECT doc_id, tok, count(*) AS c FROM (
    SELECT doc_id,
      unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS tok
    FROM documents) GROUP BY 1, 2
), t AS (
  SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS tot FROM counts
)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
  floor((-sum((CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))
    * ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE)))) * 1000000 + 0.5) / 1000000 AS entropy
FROM t GROUP BY doc_id""",

    // unigram surprisal: identical token contract as q26 (raw \s+ split),
    // ln over identical doubles, floor-rounded average
    "q92_surprisal" ->
      """WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS tok
  FROM documents
), tf AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS t FROM tf
)
SELECT k.doc_id, count(*) AS n_tokens,
  floor(avg(-ln(CAST(f.c AS DOUBLE) / CAST(tot.t AS DOUBLE))) * 1000000 + 0.5) / 1000000 AS surprisal
FROM toks k JOIN tf f ON k.tok = f.tok, tot
GROUP BY k.doc_id""",

    // gap-based sessionization: running sum of break flags = session idx
    "q91_sessionize" ->
      """WITH g AS (
  SELECT user_id, ts, event_id,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
), s AS (
  SELECT user_id, ts,
    sum(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM g
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, count(*) AS n_events,
  CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS duration_us
FROM s GROUP BY 1, 2""",

    // SCD2 change history: null-safe change detection against the lag,
    // then the next change's ts via lead over the surviving runs
    "q90_scd2_history" ->
      """WITH t AS (
  SELECT user_id, ts, event_id, CAST(floor(value / 20.0) AS BIGINT) AS tier FROM events
), c AS (
  SELECT user_id, ts, event_id, tier,
    lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM t
), runs AS (
  -- IS DISTINCT FROM mirrors the engine's null-safe <=> change test
  -- exactly (a null tier starts/continues runs the same way on both
  -- sides); 'prev IS NULL OR tier <> prev' would diverge on null tiers
  SELECT user_id, ts, event_id, tier FROM c WHERE tier IS DISTINCT FROM prev
)
SELECT user_id, tier, ts AS valid_from,
  lead(ts) OVER w AS valid_to,
  CAST(lead(ts) OVER w IS NULL AS INT) AS is_current
FROM runs
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",

    // funnel via DuckDB's native ASOF (the q19-verified construction):
    // per-user conversion counts + mean latency from exact micros
    "q86_funnel" ->
      """WITH c AS (
  SELECT p.user_id, p.ts, v.ts AS entry_ts
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
    ON p.user_id = v.user_id AND p.ts >= v.ts
)
SELECT user_id, count(*) AS n_convert, count(entry_ts) AS n_converted,
  floor(avg(CAST(epoch_us(ts) - epoch_us(entry_ts) AS DOUBLE) / 1000000.0) * 1000000 + 0.5) / 1000000 AS avg_latency_s
FROM c GROUP BY user_id""",

    "q87_cohorts" ->
      """WITH cohorts AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
)
SELECT strftime(c.cohort_date, '%Y-%m-%d') AS cohort_date,
  datediff('day', c.cohort_date, a.d) AS day_offset,
  count(DISTINCT a.user_id) AS n_users
FROM activity a JOIN cohorts c ON a.user_id = c.user_id
GROUP BY 1, 2""",

    "q88_gap_stats" ->
      """WITH g AS (
  SELECT user_id, event_id,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id, count(CASE WHEN gap_us > 3600000000 THEN 1 END) AS n_gaps,
  max(gap_us) AS max_gap_us, count(*) AS n_rows
FROM g GROUP BY user_id""",

    // bounded-horizon EWMA: the identical 10 lag terms in the identical
    // left-to-right summation order; alpha = 0.5 makes every weight an
    // exact dyadic rational, so both engines compute bit-equal doubles
    "q83_ewma" -> q83EwmaSql,

    "q149_fracdiff" -> q149FracDiffSql,

    "q84_winsorize" ->
      """WITH b AS (
  SELECT event_type,
    quantile_cont(value, 0.01) AS lo, quantile_cont(value, 0.99) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type, count(*) AS n,
  floor(avg(least(greatest(e.value, b.lo), b.hi)) * 1000000 + 0.5) / 1000000 AS avg_w,
  floor(min(least(greatest(e.value, b.lo), b.hi)) * 1000000 + 0.5) / 1000000 AS min_w,
  floor(max(least(greatest(e.value, b.lo), b.hi)) * 1000000 + 0.5) / 1000000 AS max_w
FROM events e JOIN b ON e.event_type = b.event_type
GROUP BY e.event_type""",

    "q85_histogram" ->
      """SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bin, count(*) AS n
FROM events GROUP BY 1, 2""",

    // int8 quantized kNN: codes = floor(x/||x||*127 + 0.5) (pure IEEE,
    // engine-portable), scores are exact integer dot products
    "q82_quantized_knn" ->
      """WITH n AS (
  SELECT vec_id, embedding,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
), q8 AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / nrm * 127.0 + 0.5) AS BIGINT)) AS cv
  FROM n
), qs AS (SELECT vec_id AS qid, cv AS qv FROM q8 WHERE vec_id < 5),
scored AS (
  SELECT qs.qid, c.vec_id AS id,
    CAST(list_sum(list_transform(range(1, 65), i -> c.cv[i] * qs.qv[i])) AS BIGINT) AS qdot
  FROM q8 c, qs WHERE c.vec_id <> qs.qid
)
SELECT qid, id, qdot FROM (
  SELECT qid, id, qdot, row_number() OVER (PARTITION BY qid ORDER BY qdot DESC, id) AS rn
  FROM scored) WHERE rn <= 10""",

    // PII scrub: same doc_id-derived augmentation, same Java∩RE2 regex
    // subset stated verbatim, same email→card→intl→phone→IPv6→IPv4
    // redaction order (six classes since r10)
    "q124_pii_redaction" ->
      """WITH aug AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 2 = 0 THEN ' contact u' || doc_id || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 3 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-4567' ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' || (doc_id % 256) || '.7' ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN ' card 4111-1111-1111-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
    || CASE WHEN doc_id % 11 = 0 THEN ' intl +44-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-7946-0958' ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN ' node 2001:db8:' || (doc_id % 9999) || '::1' ELSE '' END
    AS a
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
  CAST(len(regexp_extract_all(a, '\b\d{4}-\d{4}-\d{4}-\d{4}\b')) AS INT) AS n_card,
  CAST(len(regexp_extract_all(a, '\+\d{1,3}[ -]\d{1,4}[ -]\d{3,4}[ -]\d{3,4}\b')) AS INT) AS n_intl,
  CAST(len(regexp_extract_all(a, '\b\d{3}-\d{3}-\d{4}\b')) AS INT) AS n_phone,
  CAST(len(regexp_extract_all(a, '\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\b|\b(?:[0-9A-Fa-f]{1,4}:){1,7}:[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4}){0,5}\b')) AS INT) AS n_ipv6,
  CAST(len(regexp_extract_all(a, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ip,
  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(a,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\b\d{4}-\d{4}-\d{4}-\d{4}\b', '<CARD>', 'g'),
      '\+\d{1,3}[ -]\d{1,4}[ -]\d{3,4}[ -]\d{3,4}\b', '<INTL>', 'g'),
      '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
      '\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\b|\b(?:[0-9A-Fa-f]{1,4}:){1,7}:[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4}){0,5}\b', '<IPV6>', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS redacted_md5
FROM aug""",

    // SQL-surface twin of q124's redaction hash: Spark runs the
    // registered pii_redact scalar through spark.sql; the oracle states
    // the identical chain inline
    "q125_pii_sql" ->
      """WITH aug AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 2 = 0 THEN ' contact u' || doc_id || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 3 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-4567' ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' || (doc_id % 256) || '.7' ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN ' card 4111-1111-1111-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
    || CASE WHEN doc_id % 11 = 0 THEN ' intl +44-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-7946-0958' ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN ' node 2001:db8:' || (doc_id % 9999) || '::1' ELSE '' END
    AS a
  FROM documents
)
SELECT doc_id,
  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(a,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\b\d{4}-\d{4}-\d{4}-\d{4}\b', '<CARD>', 'g'),
      '\+\d{1,3}[ -]\d{1,4}[ -]\d{3,4}[ -]\d{3,4}\b', '<INTL>', 'g'),
      '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
      '\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\b|\b(?:[0-9A-Fa-f]{1,4}:){1,7}:[0-9A-Fa-f]{1,4}(?::[0-9A-Fa-f]{1,4}){0,5}\b', '<IPV6>', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS redacted_md5
FROM aug""",

    // graft_tx SQL time travel: the seeded (negated-price) v0 snapshot
    // and the upserted latest snapshot, both recomputed from raw orders
    "q126_tx_sql_travel" ->
      """SELECT 'v0' AS snap, CAST(year(o_orderdate) AS INTEGER) AS order_year,
  count(*) AS n, round(sum(-o_totalprice), 2) AS total
FROM orders WHERE o_orderkey % 10 = 7 GROUP BY 2
UNION ALL
SELECT 'latest' AS snap, CAST(year(o_orderdate) AS INTEGER) AS order_year,
  count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders WHERE o_orderkey % 10 = 7 GROUP BY 2""",

    // BM25 top-10: Lucene-style non-negative idf, k1=1.2 b=0.75; avgdl,
    // idf, and the tf-normalization each rounded to 1e-6 as produced,
    // per-(doc,term) scores summed as integer micros (no float-order
    // wobble), rank total on (micros desc, doc_id). All float literals
    // written e0 so DuckDB computes in DOUBLE like Spark, never DECIMAL.
    "q127_bm25" ->
      """WITH tk AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS toks
  FROM documents
), d AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
    list_filter(toks, t -> t IN ('dup', 'key', 'window', 'join', 'batch')) AS qt
  FROM tk
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
    floor(avg(dl) * 1000000 + 0.5) / 1000000 AS avgdl
  FROM d
), tf AS (
  SELECT doc_id, dl, t AS term, count(*) AS tf
  FROM (SELECT doc_id, dl, unnest(qt) AS t FROM d)
  GROUP BY 1, 2, 3
), w AS (
  SELECT doc_id, dl, term, tf, count(*) OVER (PARTITION BY term) AS df FROM tf
), sc AS (
  SELECT doc_id, dl,
    floor(ln(1e0 + (n - df + 0.5e0) / (df + 0.5e0)) * 1000000 + 0.5) / 1000000 AS idf,
    floor(tf * 2.2e0 / (tf + 1.2e0 * (0.25e0 + 0.75e0 * dl / avgdl)) * 1000000 + 0.5) / 1000000 AS tfn
  FROM w CROSS JOIN stats
), perdoc AS (
  SELECT doc_id, dl, count(*) AS n_terms,
    CAST(sum(CAST(floor(idf * tfn * 1e6 + 0.5e0) AS BIGINT)) AS BIGINT) AS sm
  FROM sc GROUP BY 1, 2
), top AS (SELECT * FROM perdoc ORDER BY sm DESC, doc_id LIMIT 10)
SELECT row_number() OVER (ORDER BY sm DESC, doc_id) AS rank,
  doc_id, n_terms, dl, CAST(sm AS DOUBLE) / 1e6 AS score
FROM top""",

    // sliding chunks: 64-token windows, step 48 (overlap 16); range()
    // excludes tc exactly as sequence(0, tc-1, 48) does; md5 over the
    // space-rejoined slice matches Spark's array_join
    "q128_doc_chunks" ->
      """WITH tk AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS toks
  FROM documents
), d AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS tc FROM tk WHERE len(toks) >= 1
), st AS (
  SELECT doc_id, toks, tc, unnest(range(0, tc, 48)) AS s FROM d
)
SELECT doc_id, CAST(s // 48 AS INTEGER) AS chunk_idx,
  CAST(s AS INTEGER) AS start_token,
  CAST(least(64, tc - s) AS INTEGER) AS n_tokens,
  md5(array_to_string(list_slice(toks, s + 1, s + 64), ' ')) AS chunk_md5
FROM st""",

    // SemDeDup keep-list: recursive closure (min reachable id) over the
    // exact-cosine pair list q60 verifies, every vector assigned its
    // component representative; singletons keep themselves
    "q129_semantic_dedup" ->
      s"""WITH RECURSIVE e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
), pr AS (
  SELECT id_a, id_b FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      floor((list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm)) * 1000000 + 0.5) / 1000000 AS score
    FROM e a JOIN e b ON a.vec_id < b.vec_id)
  WHERE score >= 0.4
), ${closureCtes("pr", "id_a", "id_b")}, comp AS (
  SELECT id, min(lab) AS rep FROM reach GROUP BY id
)
SELECT v.vec_id, coalesce(c.rep, v.vec_id) AS rep_id,
  coalesce(c.rep, v.vec_id) = v.vec_id AS kept
FROM embeddings v LEFT JOIN comp c ON c.id = v.vec_id""",

    // BPE pair stats: corpus collapses to the distinct-word frame, then
    // adjacent char pairs weighted by word count; overlaps count
    // separately (i ranges 1..len-1), rank total on (freq desc, pair)
    "q130_bpe_pairs" ->
      """WITH wc AS (
  SELECT t AS w, count(*) AS wc
  FROM (SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS t
        FROM documents)
  GROUP BY 1
), p AS (
  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, w, wc
  FROM wc, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
  WHERE len(w) >= 2
), a AS (
  SELECT pair, CAST(sum(wc) AS BIGINT) AS freq, count(DISTINCT w) AS n_words
  FROM p GROUP BY 1
), top AS (SELECT * FROM a ORDER BY freq DESC, pair LIMIT 30)
SELECT row_number() OVER (ORDER BY freq DESC, pair) AS rank, pair, freq, n_words
FROM top""",

    // fixed-weight logistic quality model: features rounded to 1e-6
    // before the linear combination, logit rounded before the sigmoid,
    // probability after; e0 literals keep DuckDB in DOUBLE throughout
    "q131_quality_logistic" -> qualityLogisticSql,

    // chunk -> pack composite: the q128 chunk CTE feeding the q68
    // cumulative-packing window, ordered (doc_id, chunk_idx) within
    // 4 shards at a 256-token budget
    "q132_chunk_pack" ->
      """WITH tk AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS toks
  FROM documents
), d AS (
  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS tc FROM tk WHERE len(toks) >= 1
), ch AS (
  SELECT doc_id, CAST(s // 48 AS INTEGER) AS chunk_idx,
    CAST(least(64, tc - s) AS BIGINT) AS tokens
  FROM (SELECT doc_id, tc, unnest(range(0, tc, 48)) AS s FROM d)
), binned AS (
  SELECT doc_id % 4 AS shard, doc_id, tokens,
    CAST(floor((sum(tokens) OVER (PARTITION BY doc_id % 4
      ORDER BY doc_id, chunk_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens) / 256.0) AS BIGINT) AS bin
  FROM ch
)
SELECT shard, bin, count(*) AS n_chunks, CAST(sum(tokens) AS BIGINT) AS bin_tokens,
  count(DISTINCT doc_id) AS n_docs
FROM binned GROUP BY 1, 2""",

    // auto-sized LSH recall gate: oracle recomputes the exact pair count
    // (q60's construction) and the corpus size; the verdict booleans must
    // come back true from the engine's in-plan comparison
    "q133_lsh_autosized_recall" ->
      """WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
), pairs AS (
  SELECT id_a, id_b FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      floor((list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm)) * 1000000 + 0.5) / 1000000 AS score
    FROM e a JOIN e b ON a.vec_id < b.vec_id)
  WHERE score >= 0.4
)
SELECT (SELECT count(*) FROM embeddings) AS n_vectors,
  count(*) AS n_exact_pairs, true AS recall_ok, true AS precision_ok
FROM pairs""",

    "q134_quality_sql" -> qualityLogisticSql,

    // IVF-PQ residual ANN: the oracle recomputes the exact top-10 side
    // (q112's construction) and predicts the measured-margin recall
    // verdict true — the row hash-matches iff the residual composite
    // honors its pinned bound
    "q140_ivfpq_knn" ->
      """WITH qv AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT qv.qid, e.vec_id AS id,
    round(
      list_sum(list_transform(range(1, 65), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.qe[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform(qv.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS score
  FROM embeddings e, qv
  WHERE e.vec_id <> qv.qid
),
top AS (
  SELECT qid, id FROM (
    SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rn
    FROM scored) WHERE rn <= 10)
SELECT count(DISTINCT qid) AS n_queries, count(*) AS n_exact, true AS recall_ok
FROM top""",

    // leakage-safe split: q72's recursive closure gives the duplicate
    // cluster, q75's md5-uniform on the CLUSTER id gives the side —
    // near-dups can never straddle the 20% cut; singletons hash their
    // own id (coalesce), identically to q67's row split
    "q135_leakage_safe_split" ->
      s"""WITH RECURSIVE $minhashPairsCte,
${closureCtes("pairs", "doc_a", "doc_b")}, comp AS (
  SELECT id, min(lab) AS grp FROM reach GROUP BY id
), g AS (
  SELECT d.doc_id, coalesce(c.grp, d.doc_id) AS grp
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
)
SELECT doc_id, grp,
  CASE WHEN CAST(('0x' || substr(md5(CAST(grp AS VARCHAR)), 1, 15)) AS BIGINT)
         / 1152921504606846976.0 < 0.2e0 THEN 'test' ELSE 'train' END AS split
FROM g""",

    // quality-canonical dedup: the q72 closure joined to the q131
    // quality CTEs; rank inside each cluster on the identical
    // pre-rounded probability (doc_id tie-break = a total order)
    "q136_canonical_quality_dedup" ->
      s"""WITH RECURSIVE $minhashPairsCte,
${closureCtes("pairs", "doc_a", "doc_b")}, comp AS (
  SELECT id, min(lab) AS grp FROM reach GROUP BY id
), $qualityPCtes, g AS (
  SELECT d.doc_id, coalesce(c.grp, d.doc_id) AS grp
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
), r AS (
  SELECT g.doc_id, g.grp, p.quality_p,
    row_number() OVER (PARTITION BY g.grp ORDER BY p.quality_p DESC, g.doc_id) AS rk
  FROM g JOIN p ON g.doc_id = p.doc_id
)
SELECT doc_id, grp, quality_p, rk = 1 AS kept FROM r""",

    // token-id encoding: top-16 frequency-rank vocab (freq desc, token
    // asc — total), OOV -> 0; the id sequence is pinned by a 24-id head
    // string + a position-weighted checksum (both order-sensitive),
    // positions generated with the q132 unnest(range) pattern
    "q137_token_ids" ->
      s"""WITH ${vocabEncCtes(16)}
SELECT doc_id,
  count(*) AS n_tokens,
  CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
  string_agg(CASE WHEN pos <= 24 THEN CAST(id AS VARCHAR) END, ' ' ORDER BY pos)
    AS ids_head,
  CAST(sum(id * pos) AS BIGINT) AS ids_checksum
FROM enc GROUP BY doc_id""",

    // trainer-ready packing: the q132 chunk/pack layout with CONTENT
    // pinned — per-chunk position-weighted id checksums (q137's vocab
    // and encode CTEs; pos within chunk = corpus pos - chunk start)
    // summed per bin alongside the count columns
    "q138_token_pack" ->
      s"""WITH ${vocabEncCtes(16)}, ch AS (
  SELECT doc_id, CAST(s // 48 AS INTEGER) AS chunk_idx, CAST(s AS BIGINT) AS s,
    CAST(least(64, tc - s) AS BIGINT) AS tokens
  FROM (SELECT doc_id, tc, unnest(range(0, tc, 48)) AS s FROM nz)
), chsum AS (
  SELECT ch.doc_id, ch.chunk_idx, ch.tokens,
    CAST(sum(e.id * (e.pos - ch.s)) AS BIGINT) AS chunk_sum
  FROM ch JOIN enc e
    ON e.doc_id = ch.doc_id AND e.pos > ch.s AND e.pos <= ch.s + 64
  GROUP BY 1, 2, 3
), binned AS (
  SELECT doc_id % 4 AS shard, tokens, chunk_sum,
    CAST(floor((sum(tokens) OVER (PARTITION BY doc_id % 4
      ORDER BY doc_id, chunk_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens) / 256.0) AS BIGINT) AS bin
  FROM chsum
)
SELECT shard, bin, count(*) AS n_chunks, CAST(sum(tokens) AS BIGINT) AS bin_tokens,
  CAST(sum(chunk_sum) AS BIGINT) AS bin_ids_checksum
FROM binned GROUP BY 1, 2""",

    // vocab coverage curve at dyadic ranks: top-32 by (freq desc,
    // token), running coverage = cumulative freq over the corpus token
    // total, rounded 1e-6 before comparison
    "q139_vocab_coverage" ->
      s"""WITH ${vocabEncCtes(32)}, tot AS (
  SELECT CAST(sum(len(toks)) AS BIGINT) AS total_tokens FROM tk
), cum AS (
  SELECT token_id AS rank, token, CAST(freq AS BIGINT) AS freq,
    sum(freq) OVER (ORDER BY token_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cf
  FROM v
)
SELECT CAST(rank AS BIGINT) AS rank, token, freq,
  floor((CAST(cf AS DOUBLE) / CAST(tot.total_tokens AS DOUBLE)) * 1000000 + 0.5) / 1000000
    AS coverage
FROM cum CROSS JOIN tot
WHERE rank IN (1, 2, 4, 8, 16, 32)""",

    // linear-interpolation resample: q116's grid/run construction both
    // ways (asc run carries the previous print, desc run the next); the
    // interpolation fraction is a ratio of exact BIGINT epoch-micros
    // differences cast to double at the division, lerp pinned with the
    // sr6 fixed-point floor
    "q141_resample_linear" ->
      """WITH c AS (
  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
    arg_max(value, event_id) AS close
  FROM events GROUP BY 1, 2
), b AS (
  SELECT event_type, min(bucket_start) AS mn, max(bucket_start) AS mx FROM c GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 5 MINUTE)) AS bucket_start
  FROM b
), j AS (
  SELECT g.event_type, g.bucket_start, c.close
  FROM grid g LEFT JOIN c
    ON g.event_type = c.event_type AND g.bucket_start = c.bucket_start
), runs AS (
  SELECT event_type, bucket_start, close,
    count(close) OVER (PARTITION BY event_type ORDER BY bucket_start
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runf,
    count(close) OVER (PARTITION BY event_type ORDER BY bucket_start DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runb
  FROM j
), nb AS (
  SELECT event_type, bucket_start, close,
    max(close) OVER (PARTITION BY event_type, runf) AS prev,
    max(CASE WHEN close IS NOT NULL THEN epoch_us(bucket_start) END)
      OVER (PARTITION BY event_type, runf) AS preve,
    max(close) OVER (PARTITION BY event_type, runb) AS nxt,
    max(CASE WHEN close IS NOT NULL THEN epoch_us(bucket_start) END)
      OVER (PARTITION BY event_type, runb) AS nxte
  FROM runs
)
SELECT event_type, bucket_start, round(close, 4) AS close,
  floor((CASE WHEN close IS NOT NULL THEN close
              WHEN prev IS NULL THEN nxt
              WHEN nxt IS NULL THEN prev
              ELSE prev + (nxt - prev) *
                (CAST(epoch_us(bucket_start) - preve AS DOUBLE)
                   / CAST(nxte - preve AS DOUBLE)) END) * 1000000 + 0.5) / 1000000
    AS lerp,
  CAST(close IS NULL AS INT) AS is_gap
FROM nb""",

    // temperature mixture: q81's budget arithmetic with the weight
    // replaced by the micro-quantized sqrt of the source's token total
    // (floor(sqrt·1e6) as BIGINT — exact integer share sums, and sqrt
    // is correctly rounded in both engines)
    "q142_temperature_mix" ->
      """WITH toks AS (
  SELECT doc_id, source,
    CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS ntok
  FROM documents
), tot AS (
  SELECT source, CAST(sum(ntok) AS BIGINT) AS toks FROM toks GROUP BY source
), wts AS (
  SELECT source, toks,
    CAST(floor(sqrt(CAST(toks AS DOUBLE)) * 1000000) AS BIGINT) AS w
  FROM tot
), rates AS (
  SELECT source,
    CASE WHEN toks = 0 THEN 1.0
         ELSE LEAST(1.0, CAST(0.3 AS DOUBLE) * CAST((SELECT sum(toks) FROM wts) AS DOUBLE)
           * CAST(w AS DOUBLE)
           / CAST((SELECT sum(w) FROM wts) AS DOUBLE)
           / CAST(toks AS DOUBLE)) END AS rate
  FROM wts
)
SELECT t.source, count(*) AS n_docs, CAST(sum(t.ntok) AS BIGINT) AS n_tokens
FROM toks t JOIN rates r ON t.source = r.source
WHERE CAST(('0x' || substr(md5(COALESCE(CAST(t.doc_id AS VARCHAR), chr(0) || 'graft-null-id')), 1, 15)) AS BIGINT)
        / 1152921504606846976.0 < r.rate
GROUP BY t.source""",

    // purged k-fold: fold ids from the identical BIGINT epoch-micros
    // arithmetic (one double division, floor, least-clamp at k-1); a
    // row is purged for its neighbor fold when shifting its time by
    // the embargo crosses the shared boundary; k-row spine so an empty
    // middle fold cannot shift the lag/lead
    "q143_purged_folds" ->
      """WITH b AS (
  SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events
), f AS (
  SELECT
    CAST(LEAST(floor(CAST(epoch_us(ts) - mn AS DOUBLE) * 5 / CAST(mx - mn + 1 AS DOUBLE)), 4) AS INT) AS fold,
    CAST(LEAST(floor(CAST(epoch_us(ts) + 86400000000 - mn AS DOUBLE) * 5 / CAST(mx - mn + 1 AS DOUBLE)), 4) AS INT) AS fhi,
    CAST(LEAST(floor(CAST(epoch_us(ts) - 86400000000 - mn AS DOUBLE) * 5 / CAST(mx - mn + 1 AS DOUBLE)), 4) AS INT) AS flo
  FROM events, b
), agg AS (
  SELECT fold, count(*) AS n_test,
    CAST(sum(CASE WHEN fhi > fold AND fold < 4 THEN 1 ELSE 0 END) AS BIGINT) AS nhi,
    CAST(sum(CASE WHEN flo < fold AND fold > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nlo
  FROM f GROUP BY fold
), spine AS (
  SELECT CAST(unnest(range(5)) AS INT) AS fold
), sj AS (
  SELECT s.fold, COALESCE(a.n_test, 0) AS n_test,
    COALESCE(a.nhi, 0) AS nhi, COALESCE(a.nlo, 0) AS nlo
  FROM spine s LEFT JOIN agg a ON s.fold = a.fold
), p AS (
  SELECT fold, n_test,
    COALESCE(lag(nhi) OVER (ORDER BY fold), 0) +
      COALESCE(lead(nlo) OVER (ORDER BY fold), 0) AS n_purged,
    CAST(sum(n_test) OVER () AS BIGINT) AS tot
  FROM sj
)
SELECT fold, CAST(n_test AS BIGINT) AS n_test, CAST(n_purged AS BIGINT) AS n_purged,
  CAST(tot - n_test - n_purged AS BIGINT) AS n_train
FROM p""",

    // walk-forward splits: same slice/embargo arithmetic as q143; train
    // is the running total of earlier slices minus the previous slice's
    // embargo tail; slice 0 never tests
    "q144_walk_forward" ->
      """WITH b AS (
  SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events
), f AS (
  SELECT
    CAST(LEAST(floor(CAST(epoch_us(ts) - mn AS DOUBLE) * 5 / CAST(mx - mn + 1 AS DOUBLE)), 4) AS INT) AS fold,
    CAST(LEAST(floor(CAST(epoch_us(ts) + 86400000000 - mn AS DOUBLE) * 5 / CAST(mx - mn + 1 AS DOUBLE)), 4) AS INT) AS fhi
  FROM events, b
), agg AS (
  SELECT fold, count(*) AS n_test,
    CAST(sum(CASE WHEN fhi > fold AND fold < 4 THEN 1 ELSE 0 END) AS BIGINT) AS nhi
  FROM f GROUP BY fold
), spine AS (
  SELECT CAST(unnest(range(5)) AS INT) AS fold
), sj AS (
  SELECT s.fold, COALESCE(a.n_test, 0) AS n_test, COALESCE(a.nhi, 0) AS nhi
  FROM spine s LEFT JOIN agg a ON s.fold = a.fold
), p AS (
  SELECT fold, n_test,
    CAST(COALESCE(sum(n_test) OVER (ORDER BY fold
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum,
    COALESCE(lag(nhi) OVER (ORDER BY fold), 0) AS n_purged
  FROM sj
)
SELECT fold, CAST(n_test AS BIGINT) AS n_test, CAST(n_purged AS BIGINT) AS n_purged,
  CAST(cum - n_purged AS BIGINT) AS n_train
FROM p WHERE fold >= 1""",

    // underwater spells: running peak, spell id = count of at-peak rows
    // so far (a refreshed peak opens a new spell; reaching the prior
    // peak counts as recovery), per-spell underwater length and depth,
    // then the per-series risk summary
    "q145_underwater" ->
      """WITH pk AS (
  SELECT user_id, ts, event_id, value,
    max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM events WHERE value > 0
), sp AS (
  SELECT user_id, value, peak,
    sum(CASE WHEN value = peak THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
      ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS spell,
    CAST(value < peak AS BIGINT) AS uw
  FROM pk
), g AS (
  SELECT user_id, spell, CAST(sum(uw) AS BIGINT) AS uw_len,
    min(value / peak - 1.0) AS depth
  FROM sp GROUP BY 1, 2
)
SELECT user_id, count(CASE WHEN uw_len > 0 THEN 1 END) AS n_spells,
  CAST(max(uw_len) AS BIGINT) AS max_underwater,
  floor(min(depth) * 1000000 + 0.5) / 1000000 AS max_drawdown
FROM g GROUP BY user_id""",

    // interpolated bigram surprisal: Jelinek-Mercer λ=0.75 over adjacent
    // token pairs; bigram/context/unigram tables from the same corpus
    // (self-computed form — every pair in-vocabulary), surprisal rounded
    // with the sr6 floor
    "q146_bigram_surprisal" ->
      """WITH tk AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS t
  FROM documents
), pr AS (
  SELECT doc_id, t[i] AS v, t[i+1] AS w
  FROM tk, LATERAL (SELECT unnest(range(1, len(t))) AS i) r
  WHERE len(t) >= 2
), bg AS (
  SELECT v, w, CAST(count(*) AS BIGINT) AS cbw FROM pr GROUP BY 1, 2
), cx AS (
  SELECT v, CAST(count(*) AS BIGINT) AS cv FROM pr GROUP BY 1
), ug AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(t) AS tok FROM tk) GROUP BY 1
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS t FROM ug
)
SELECT p.doc_id, count(*) AS n_bigrams,
  floor(avg(-ln(0.75 * (CAST(b.cbw AS DOUBLE) / CAST(c.cv AS DOUBLE))
      + 0.25 * CAST(u.c AS DOUBLE) / CAST(tot.t AS DOUBLE))) * 1000000 + 0.5) / 1000000
    AS surprisal
FROM pr p
JOIN bg b ON p.v = b.v AND p.w = b.w
JOIN cx c ON p.v = c.v
JOIN ug u ON p.w = u.tok
CROSS JOIN tot
GROUP BY p.doc_id""",

    // whitened PQ: the verdict pattern one step further — the exact side
    // lives in the eigenbasis DuckDB cannot reproduce, but the COUNTS
    // are structural (each of the 5 queries has exactly k=10 exact
    // neighbors in any corpus bigger than 11 rows) and the recall gate
    // is measured with margin (1.0 / 0.88 vs 0.7)
    "q166_whitened_pq" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_queries,
  CAST(count(*) * 10 AS BIGINT) AS n_exact, true AS recall_ok
FROM embeddings WHERE vec_id < 5""",

    // autocorrelation: Pearson over aligned (x_t, x_{t-l}) pairs — corr's
    // pair-null semantics (first l rows of each series drop out of that
    // lag only) are the SQL standard in both engines; NaN-vs-NULL on
    // degenerate series normalized Spark-side
    "q167_autocorrelation" ->
      """WITH s AS (
  SELECT user_id, value,
    lag(value, 1) OVER w AS l1, lag(value, 2) OVER w AS l2,
    lag(value, 5) OVER w AS l5, lag(value, 10) OVER w AS l10
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(count(value) AS BIGINT) AS n,
  floor(corr(value, l1) * 1000000 + 0.5) / 1000000 AS acf_1,
  floor(corr(value, l2) * 1000000 + 0.5) / 1000000 AS acf_2,
  floor(corr(value, l5) * 1000000 + 0.5) / 1000000 AS acf_5,
  floor(corr(value, l10) * 1000000 + 0.5) / 1000000 AS acf_10
FROM s GROUP BY 1""",

    // cross-sectional z: BIGINT micro-sum daily signal (identical doubles
    // both engines), quantile_cont == percentile fences, winsorized
    // moments per day, percent_rank over the (value, id) total order
    "q169_cross_sectional_z" ->
      """WITH daily AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
    CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000
      AS uval
  FROM events GROUP BY 1, 2
), f AS (
  SELECT day, quantile_cont(uval, 0.05) AS lo, quantile_cont(uval, 0.95) AS hi
  FROM daily GROUP BY 1
), c AS (
  SELECT d.user_id, d.day, d.uval,
    CASE WHEN d.uval < f.lo THEN f.lo
         WHEN d.uval > f.hi THEN f.hi ELSE d.uval END AS wv
  FROM daily d JOIN f ON d.day = f.day
), m AS (
  SELECT day, avg(wv) AS mu, stddev_samp(wv) AS sd FROM c GROUP BY 1
)
SELECT c.day, c.user_id, floor(c.uval * 1000000 + 0.5) / 1000000 AS uval,
  CASE WHEN m.sd IS NULL OR m.sd = 0 THEN NULL
       ELSE floor(((c.wv - m.mu) / m.sd + 0.0) * 1000000 + 0.5) / 1000000 END AS z,
  floor(percent_rank() OVER (PARTITION BY c.day ORDER BY c.uval, c.user_id)
    * 1000000 + 0.5) / 1000000 AS pct_rank
FROM c JOIN m ON c.day = m.day""",

    // Amihud illiquidity: q157's candle CTE -> day frame (last close by
    // bucket, summed volume) -> |ret|/volume scaled 1e6 and its trailing
    // 5-day mean (avg skips null days, the literature's valid-day mean)
    "q170_amihud" ->
      """WITH cd AS (
  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
    arg_max(value, event_id) AS cl, sum(value) AS vol
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, strftime(date_trunc('day', bucket_start), '%Y-%m-%d') AS day,
    arg_max(cl, bucket_start) AS cl, sum(vol) AS volume,
    CAST(count(*) AS BIGINT) AS n_bars
  FROM cd GROUP BY 1, 2
), r AS (
  SELECT event_type, day, n_bars, volume,
    cl / lag(cl) OVER w - 1.0 AS ret
  FROM d
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
), i AS (
  SELECT *, CASE WHEN ret IS NULL OR volume IS NULL OR volume <= 0 THEN NULL
       ELSE abs(ret) / volume END AS illiq_raw
  FROM r
)
SELECT event_type, day, n_bars,
  floor(volume * 1000000 + 0.5) / 1000000 AS volume,
  floor((ret + 0.0) * 1000000 + 0.5) / 1000000 AS ret,
  floor(illiq_raw * 1000000 * 1000000 + 0.5) / 1000000 AS illiq,
  floor(avg(illiq_raw * 1000000) OVER
    (PARTITION BY event_type ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    * 1000000 + 0.5) / 1000000 AS illiq_roll
FROM i""",

    // seasonality: (key, hour) aggregate + overall per-key mean; t is the
    // one-sample statistic with the zero-variance bucket null
    "q171_seasonality" ->
      """WITH h AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS hour,
    CAST(count(value) AS BIGINT) AS n,
    avg(value) AS mh, stddev_samp(value) AS sd
  FROM events GROUP BY 1, 2
), o AS (
  SELECT event_type, avg(value) AS ma FROM events GROUP BY 1
)
SELECT h.event_type, h.hour, h.n,
  floor(mh * 1000000 + 0.5) / 1000000 AS mean_h,
  CASE WHEN sd IS NULL OR sd = 0 THEN NULL
       ELSE floor(((mh - ma) / (sd / sqrt(CAST(n AS DOUBLE))) + 0.0)
         * 1000000 + 0.5) / 1000000 END AS t_stat
FROM h JOIN o ON h.event_type = o.event_type""",

    // online PSI: first 256 float32-rounded values per key are the
    // sealed reference (q154's ordering disposition — ts alone, no
    // per-user collisions); bins/clamp/Laplace are q150's exact
    // arithmetic; the 10-term sum floors at 1e-6 on both sides
    "q184_online_psi" ->
      """WITH s AS (
  SELECT user_id, CAST(CAST(value AS REAL) AS DOUBLE) AS p,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS rn
  FROM events
), tot AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1
), b AS (
  SELECT user_id, min(p) AS mn, max(p) AS mx FROM s WHERE rn <= 256 GROUP BY 1
), binned AS (
  SELECT s.user_id, s.rn > 256 AS cur,
    CAST(CASE WHEN b.mx = b.mn THEN 0
      ELSE least(greatest(floor((s.p - b.mn) * 10 / (b.mx - b.mn)), 0), 9)
    END AS INT) AS bin
  FROM s JOIN b ON s.user_id = b.user_id
), cnt AS (
  SELECT user_id, bin,
    CAST(sum(CASE WHEN cur THEN 0 ELSE 1 END) AS BIGINT) AS rc,
    CAST(sum(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT) AS cc
  FROM binned GROUP BY 1, 2
), spine AS (
  SELECT t.user_id, CAST(unnest(range(10)) AS INT) AS bin FROM tot t
), filled AS (
  SELECT sp.user_id, sp.bin, COALESCE(c.rc, 0) AS rc, COALESCE(c.cc, 0) AS cc
  FROM spine sp LEFT JOIN cnt c ON sp.user_id = c.user_id AND sp.bin = c.bin
), pq AS (
  SELECT f.user_id, f.bin, f.rc, f.cc, t.n,
    LEAST(t.n, 256) AS nref, GREATEST(t.n - 256, 0) AS ncur
  FROM filled f JOIN tot t ON f.user_id = t.user_id
)
SELECT CAST(user_id AS VARCHAR) AS ticker,
  CAST(max(nref) AS BIGINT) AS n_ref, CAST(max(ncur) AS BIGINT) AS n_cur,
  CASE WHEN max(n) < 256 THEN NULL
       ELSE floor(sum((CAST(rc + 1 AS DOUBLE) / CAST(nref + 10 AS DOUBLE)
              - CAST(cc + 1 AS DOUBLE) / CAST(ncur + 10 AS DOUBLE))
            * ln((CAST(rc + 1 AS DOUBLE) / CAST(nref + 10 AS DOUBLE))
              / (CAST(cc + 1 AS DOUBLE) / CAST(ncur + 10 AS DOUBLE))))
          * 1000000 + 0.5) / 1000000 END AS psi
FROM pq GROUP BY user_id""",

    // tear sheet: daily arg-max close frame, simple returns with the
    // zero-denominator guard, running-max drawdown on exact doubles;
    // every ratio built from UNROUNDED moments in one expression and
    // sr6-floored at emission (the engine's exact arithmetic)
    "q185_tear_sheet" ->
      """WITH d AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, arg_max(value, ts) AS close
  FROM events GROUP BY 1, 2
), e AS (
  SELECT user_id, day, close,
    CASE WHEN lag(close) OVER (PARTITION BY user_id ORDER BY day) = 0 THEN NULL
         ELSE close / lag(close) OVER (PARTITION BY user_id ORDER BY day) - 1.0
    END AS ret,
    CASE WHEN max(close) OVER (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 0 THEN NULL
         ELSE close / max(close) OVER (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1.0
    END AS dd
  FROM d
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_periods,
  CAST(count(ret) AS BIGINT) AS n_rets,
  floor(avg(ret) * 252.0 * 1000000 + 0.5) / 1000000 + 0.0 AS ann_ret,
  CASE WHEN count(ret) < 2 THEN NULL
       ELSE floor(stddev_samp(ret) * sqrt(252.0) * 1000000 + 0.5) / 1000000 + 0.0
  END AS ann_vol,
  CASE WHEN count(ret) < 2 OR stddev_samp(ret) = 0 THEN NULL
       ELSE floor(avg(ret) * 252.0 / (stddev_samp(ret) * sqrt(252.0))
         * 1000000 + 0.5) / 1000000 + 0.0
  END AS sharpe,
  CASE WHEN count(ret) < 2
         OR sum(least(ret, 0.0) * least(ret, 0.0)) = 0 THEN NULL
       ELSE floor(avg(ret) * 252.0
           / (sqrt(sum(least(ret, 0.0) * least(ret, 0.0))
               / CAST(count(ret) - 1 AS DOUBLE)) * sqrt(252.0))
         * 1000000 + 0.5) / 1000000 + 0.0
  END AS sortino,
  floor(min(dd) * 1000000 + 0.5) / 1000000 + 0.0 AS max_drawdown,
  CASE WHEN min(dd) < 0
       THEN floor(avg(ret) * 252.0 / -min(dd) * 1000000 + 0.5) / 1000000 + 0.0
       ELSE NULL END AS calmar
FROM e GROUP BY user_id""",

    // expanding z-score anomalies: exclusive running BIGINT sums of
    // the micro-quantized value/square (exact integers — the window's
    // addition order cannot matter), mean/sd/z in the engine's fixed
    // IEEE order -> bit-identical z, no rounding
    "q207_zscore_stream" ->
      """WITH s AS (
  SELECT user_id, ts, CAST(CAST(value AS REAL) AS DOUBLE) AS p,
    CAST(row_number() OVER w AS BIGINT) AS rn,
    CAST(sum(CAST(floor(CAST(CAST(value AS REAL) AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
      OVER (PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT) AS s1,
    CAST(sum(CAST(floor(CAST(CAST(value AS REAL) AS DOUBLE)
        * CAST(CAST(value AS REAL) AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
      OVER (PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT) AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), z AS (
  SELECT user_id, ts, p, rn - 1 AS n_prior,
    (p - (CAST(s1 AS DOUBLE) / 1000000.0) / CAST(rn - 1 AS DOUBLE))
      / sqrt(((CAST(s2 AS DOUBLE) / 1000000.0)
          - (CAST(s1 AS DOUBLE) / 1000000.0) * (CAST(s1 AS DOUBLE) / 1000000.0)
            / CAST(rn - 1 AS DOUBLE))
        / (CAST(rn - 1 AS DOUBLE) - 1.0)) AS zv,
    ((CAST(s2 AS DOUBLE) / 1000000.0)
      - (CAST(s1 AS DOUBLE) / 1000000.0) * (CAST(s1 AS DOUBLE) / 1000000.0)
        / CAST(rn - 1 AS DOUBLE))
      / (CAST(rn - 1 AS DOUBLE) - 1.0) AS varr
  FROM s WHERE rn - 1 >= 5
)
SELECT CAST(user_id AS VARCHAR) AS ticker, ts AS datetime, p AS price,
  zv AS z, n_prior
FROM z WHERE varr > 0 AND abs(zv) >= 3.0""",

    // running OHLC twin: final snapshot per key — argmin/argmax by
    // event time (ts unique per user, the q154 disposition), float32
    // prices
    "q202_running_ohlc" ->
      """SELECT CAST(user_id AS VARCHAR) AS ticker,
  arg_min(CAST(value AS REAL), ts) AS open,
  max(CAST(value AS REAL)) AS high,
  min(CAST(value AS REAL)) AS low,
  arg_max(CAST(value AS REAL), ts) AS close,
  CAST(sum(event_id % 1000) AS BIGINT) AS volume,
  CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1""",

    // running Wilder EMA twin: alpha = 0.25 exactly dyadic, the
    // recursive CTE replays alpha*z + (1-alpha)*e on bit-identical
    // doubles — no rounding (q186's discipline)
    "q203_running_ema" ->
      """WITH RECURSIVE s AS (
  SELECT user_id, CAST(CAST(value AS REAL) AS DOUBLE) AS z,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS rn
  FROM events
), rec AS (
  SELECT user_id, rn, z AS e FROM s WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, 0.25 * s.z + 0.75 * r.e AS e
  FROM rec r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
), lastn AS (
  SELECT user_id, CAST(max(rn) AS BIGINT) AS n FROM s GROUP BY 1
)
SELECT CAST(r.user_id AS VARCHAR) AS ticker, r.e AS ema, l.n AS n
FROM rec r JOIN lastn l ON r.user_id = l.user_id AND r.rn = l.n""",

    // local-level Kalman: the recursive CTE replays the engine's exact
    // recurrence (pPred = p+q; k = pPred/(pPred+r); x' = x+k(z−x);
    // p' = (1−k)pPred) on bit-identical doubles — fixed IEEE op order,
    // so NO rounding anywhere (the q154/q158 discipline); seed x=z1,
    // p=r, gain 1
    "q186_kalman_filter" ->
      """WITH RECURSIVE s AS (
  SELECT user_id, ts, CAST(CAST(value AS REAL) AS DOUBLE) AS z,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS rn
  FROM events
), rec AS (
  SELECT user_id, rn, ts, z, z AS x, CAST(10.0 AS DOUBLE) AS p,
    CAST(1.0 AS DOUBLE) AS k
  FROM s WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, s.ts, s.z,
    r.x + ((r.p + 1.0) / ((r.p + 1.0) + 10.0)) * (s.z - r.x) AS x,
    (1.0 - (r.p + 1.0) / ((r.p + 1.0) + 10.0)) * (r.p + 1.0) AS p,
    (r.p + 1.0) / ((r.p + 1.0) + 10.0) AS k
  FROM rec r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT CAST(user_id AS VARCHAR) AS ticker, ts AS datetime, z, x AS x_hat,
  k AS k_gain, rn AS n
FROM rec""",

    // pairs cointegration screen: q170's daily close frame, pair cross
    // on the day, OLS beta/alpha sr6-ROUNDED before the spread pass so
    // the per-row spread arithmetic is identical cross-engine; AR(1)
    // rho over the spreads, half-life on the unrounded rho with -ln2
    // string-cast
    "q187_pairs_screen" ->
      """WITH cd AS (
  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
    arg_max(value, event_id) AS cl
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, strftime(date_trunc('day', bucket_start), '%Y-%m-%d') AS day,
    arg_max(cl, bucket_start) AS close
  FROM cd GROUP BY 1, 2
), p AS (
  SELECT a.event_type AS k1, b.event_type AS k2, a.day AS t,
    a.close AS x, b.close AS y
  FROM d a JOIN d b ON a.day = b.day AND a.event_type < b.event_type
), fit AS (
  SELECT k1, k2, CAST(count(*) AS BIGINT) AS n_periods,
    CASE WHEN count(*) < 2 OR var_samp(x) = 0 THEN NULL
         ELSE floor(covar_samp(y, x) / var_samp(x) * 1000000 + 0.5) / 1000000 + 0.0
    END AS beta,
    avg(x) AS mx, avg(y) AS my
  FROM p GROUP BY 1, 2
), fit2 AS (
  SELECT k1, k2, n_periods, beta,
    floor((my - beta * mx) * 1000000 + 0.5) / 1000000 + 0.0 AS alpha
  FROM fit
), sp AS (
  SELECT p.k1, p.k2, p.t, p.y - (f.alpha + f.beta * p.x) AS s
  FROM p JOIN fit2 f ON p.k1 = f.k1 AND p.k2 = f.k2
), ar AS (
  SELECT k1, k2, s, lag(s) OVER (PARTITION BY k1, k2 ORDER BY t) AS sl
  FROM sp
), rho AS (
  SELECT k1, k2,
    CASE WHEN var_samp(sl) IS NULL OR var_samp(sl) = 0 THEN NULL
         ELSE covar_samp(s, sl) / var_samp(sl) END AS r
  FROM ar GROUP BY 1, 2
)
SELECT f.k1, f.k2, f.n_periods, f.beta, f.alpha,
  CASE WHEN rho.r IS NULL THEN NULL
       ELSE floor(rho.r * 1000000 + 0.5) / 1000000 + 0.0 END AS rho,
  CASE WHEN rho.r > 0 AND rho.r < 1
       THEN floor(-CAST('0.6931471805599453' AS DOUBLE) / ln(rho.r)
         * 1000000 + 0.5) / 1000000 + 0.0
       ELSE NULL END AS half_life
FROM fit2 f JOIN rho ON f.k1 = rho.k1 AND f.k2 = rho.k2""",

    // blocked pair universe: supplier-month closes (order-free max
    // pick), returns, md5-uniform SRP projections quantized to exact
    // micro-unit BIGINTs (sign = block bit — integer sums make the id
    // engine-independent), within-block pair enumeration, per-block
    // counts + shared-period mass + global candidate reduction.
    // n_match is the ENGINE-side blocked≡full equivalence count; the
    // oracle predicts it equals n_pairs (the q164 pruned_ok pattern) —
    // the screens' stat math itself is q187's oracle-pinned form.
    "q208_blocked_pairs" ->
      """WITH d AS (
  SELECT l_suppkey AS k, strftime(l_shipdate, '%Y-%m') AS month,
    max(l_extendedprice) AS close
  FROM lineitem WHERE l_suppkey <= 100 GROUP BY 1, 2
), r AS (
  SELECT k, month,
    CASE WHEN lag(close) OVER w = 0 THEN NULL
         ELSE close / lag(close) OVER w - 1.0 END AS ret
  FROM d WINDOW w AS (PARTITION BY k ORDER BY month)
), sg AS (
  SELECT k,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':0'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s0,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':1'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s1,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':2'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s2
  FROM r WHERE ret IS NOT NULL GROUP BY 1
), blk AS (
  SELECT k, CASE WHEN s0 > 0 THEN 1 ELSE 0 END
          + CASE WHEN s1 > 0 THEN 2 ELSE 0 END
          + CASE WHEN s2 > 0 THEN 4 ELSE 0 END AS pair_block
  FROM sg
), p AS (
  SELECT ba.pair_block, a.k AS k1, b.k AS k2
  FROM d a JOIN d b ON a.month = b.month AND a.k < b.k
  JOIN blk ba ON ba.k = a.k
  JOIN blk bb ON bb.k = b.k AND bb.pair_block = ba.pair_block
), pb AS (
  SELECT pair_block, k1, k2, CAST(count(*) AS BIGINT) AS np FROM p GROUP BY 1, 2, 3
), per AS (
  SELECT pair_block, CAST(count(*) AS BIGINT) AS n_pairs,
    CAST(count(*) AS BIGINT) AS n_match,
    CAST(sum(np) AS BIGINT) AS sum_n_periods
  FROM pb GROUP BY 1
), kb AS (
  SELECT pair_block, CAST(count(*) AS BIGINT) AS n_keys FROM blk GROUP BY 1
), tot AS (
  SELECT CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS full_pairs FROM blk
), bt AS (
  SELECT CAST(coalesce(sum(n_pairs), 0) AS BIGINT) AS bp FROM per
)
SELECT kb.pair_block, kb.n_keys,
  CAST(coalesce(per.n_pairs, 0) AS BIGINT) AS n_pairs,
  CAST(coalesce(per.n_match, 0) AS BIGINT) AS n_match,
  CAST(coalesce(per.sum_n_periods, 0) AS BIGINT) AS sum_n_periods,
  tot.full_pairs,
  floor(CAST(bt.bp AS DOUBLE) / CAST(tot.full_pairs AS DOUBLE) * 1000000 + 0.5) / 1000000 AS candidate_reduction
FROM kb LEFT JOIN per USING (pair_block), tot, bt""",

    // pairs-desk capstone: q210's full DF chain -> top-20 by t (sr6
    // ties broken by keys) -> expanding-z spread backtest. The z is
    // bit-identical cross-engine (exact BIGINT prefix sums, one fixed
    // IEEE derivation — the q207 discipline), so positions and the
    // centi-unit integer P&L replicate with NO rounding in the
    // backtest leg.
    "q212_pairs_backtest" ->
      """WITH d AS (
  SELECT l_suppkey AS k, strftime(l_shipdate, '%Y-%m') AS month,
    max(l_extendedprice) AS close
  FROM lineitem WHERE l_suppkey <= 100 GROUP BY 1, 2
), r AS (
  SELECT k, month,
    CASE WHEN lag(close) OVER w = 0 THEN NULL
         ELSE close / lag(close) OVER w - 1.0 END AS ret
  FROM d WINDOW w AS (PARTITION BY k ORDER BY month)
), sg AS (
  SELECT k,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':0'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s0,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':1'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s1,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':2'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s2
  FROM r WHERE ret IS NOT NULL GROUP BY 1
), blk AS (
  SELECT k, CASE WHEN s0 > 0 THEN 1 ELSE 0 END
          + CASE WHEN s1 > 0 THEN 2 ELSE 0 END
          + CASE WHEN s2 > 0 THEN 4 ELSE 0 END AS pair_block
  FROM sg
), p AS (
  SELECT a.k AS k1, b.k AS k2, a.month AS t, a.close AS x, b.close AS y
  FROM d a JOIN d b ON a.month = b.month AND a.k < b.k
  JOIN blk ba ON ba.k = a.k
  JOIN blk bb ON bb.k = b.k AND bb.pair_block = ba.pair_block
), fit AS (
  SELECT k1, k2, CAST(count(*) AS BIGINT) AS n_periods,
    CASE WHEN count(*) < 2 OR var_samp(x) = 0 THEN NULL
         ELSE floor(covar_samp(y, x) / var_samp(x) * 1000000 + 0.5) / 1000000 + 0.0
    END AS beta,
    avg(x) AS mx, avg(y) AS my
  FROM p GROUP BY 1, 2
), fit2 AS (
  SELECT k1, k2, n_periods, beta,
    floor((my - beta * mx) * 1000000 + 0.5) / 1000000 + 0.0 AS alpha
  FROM fit
), sp AS (
  SELECT p.k1, p.k2, p.t, p.y - (f.alpha + f.beta * p.x) AS s
  FROM p JOIN fit2 f ON p.k1 = f.k1 AND p.k2 = f.k2
), dd AS (
  SELECT k1, k2, t, s - slag AS ds, slag FROM (
    SELECT k1, k2, t, s, lag(s) OVER (PARTITION BY k1, k2 ORDER BY t) AS slag
    FROM sp)
  WHERE slag IS NOT NULL
), g AS (
  SELECT k1, k2, CAST(count(*) AS BIGINT) AS m,
    CASE WHEN count(*) < 4 OR var_samp(slag) IS NULL OR var_samp(slag) = 0 THEN NULL
         ELSE floor(covar_samp(ds, slag) / var_samp(slag) * 1000000 + 0.5) / 1000000 + 0.0
    END AS gamma,
    avg(ds) AS md, avg(slag) AS ml
  FROM dd GROUP BY 1, 2
), g2 AS (
  SELECT k1, k2, m, gamma,
    floor((md - gamma * ml) * 1000000 + 0.5) / 1000000 + 0.0 AS adf
  FROM g
), res AS (
  SELECT dd.k1, dd.k2,
    sum((ds - (g2.adf + g2.gamma * slag)) * (ds - (g2.adf + g2.gamma * slag))) AS sse,
    var_samp(slag) * (count(*) - 1) AS sxx
  FROM dd JOIN g2 ON dd.k1 = g2.k1 AND dd.k2 = g2.k2
  GROUP BY 1, 2
), tst AS (
  SELECT f.k1, f.k2, f.beta, f.alpha,
    CASE WHEN g2.gamma IS NULL OR g2.m < 4 OR res.sxx <= 0 OR res.sse <= 0 THEN NULL
         ELSE floor(g2.gamma / sqrt((res.sse / (g2.m - 2)) / res.sxx)
           * 1000000 + 0.5) / 1000000 + 0.0 END AS df_tstat
  FROM fit2 f
  JOIN g2 ON f.k1 = g2.k1 AND f.k2 = g2.k2
  JOIN res ON f.k1 = res.k1 AND f.k2 = res.k2
), sel AS (
  SELECT k1, k2, beta, alpha, df_tstat FROM (
    SELECT *, row_number() OVER (ORDER BY df_tstat ASC, k1, k2) AS rk
    FROM tst WHERE df_tstat < -3.34)
  WHERE rk <= 20
), bt AS (
  SELECT sel.k1, sel.k2, sel.beta, sel.alpha, sel.df_tstat, p.t,
    CAST(floor((p.y - (sel.alpha + sel.beta * p.x)) * 100 + 0.5) AS BIGINT) AS sc
  FROM p JOIN sel ON p.k1 = sel.k1 AND p.k2 = sel.k2
), zz AS (
  SELECT *, count(sc) OVER wp AS n,
    CAST(sum(sc) OVER wp AS BIGINT) AS ps1,
    CAST(sum(sc * sc) OVER wp AS BIGINT) AS ps2,
    lead(sc) OVER w AS nxt
  FROM bt
  WINDOW w AS (PARTITION BY k1, k2 ORDER BY t),
    wp AS (PARTITION BY k1, k2 ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), sig AS (
  SELECT k1, k2, beta, alpha, df_tstat,
    CASE WHEN z > 2.0 THEN -1 WHEN z < -2.0 THEN 1 ELSE 0 END AS pos,
    nxt - sc AS dsc
  FROM (
    SELECT *, CASE WHEN n >= 5 AND
        (CAST(ps2 AS DOUBLE) - CAST(ps1 AS DOUBLE) * CAST(ps1 AS DOUBLE) / n) / (n - 1) > 0.0
      THEN (CAST(sc AS DOUBLE) - CAST(ps1 AS DOUBLE) / n)
        / sqrt((CAST(ps2 AS DOUBLE) - CAST(ps1 AS DOUBLE) * CAST(ps1 AS DOUBLE) / n) / (n - 1))
      ELSE NULL END AS z
    FROM zz)
)
SELECT k1, k2, beta, alpha, df_tstat,
  CAST(count(*) AS BIGINT) AS n_obs,
  CAST(sum(CASE WHEN pos <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_signals,
  CAST(coalesce(sum(CASE WHEN pos * dsc > 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits,
  CAST(coalesce(sum(pos * dsc), 0) AS BIGINT) AS total_pnl_centi
FROM sig GROUP BY 1, 2, 3, 4, 5""",

    // OR-amplified blocked-recall verdict: the planted factor universe
    // (exact micro-unit group walk + idio noise), the full DF chain
    // (q210's machinery, no blocks), the top-20 by |t|, and the
    // 9-hyperplane block assignment (h = table*3 + bit; table 0 is the
    // single-table id) all replicated — survival is block equality in
    // ANY table, so recall is pure set arithmetic on the block frame.
    "q213_blocked_recall" ->
      """WITH d AS (
  SELECT CAST(s_suppkey AS BIGINT) AS k, m,
    printf('m%02d', m) AS month,
    100.0 + (sum(CAST(floor((CAST(('0x' || substr(md5('f:' || (s_suppkey % 10) || ':' || m), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000.0 + 0.5) AS BIGINT))
               OVER (PARTITION BY s_suppkey ORDER BY m)
             + CAST(floor((CAST(('0x' || substr(md5('e:' || s_suppkey || ':' || m), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 200000.0 + 0.5) AS BIGINT)
            )::DOUBLE / 1000000.0 AS close
  FROM supplier, range(1, 49) t(m)
  WHERE s_suppkey <= 100
), r AS (
  SELECT k, month,
    CASE WHEN lag(close) OVER w = 0 THEN NULL
         ELSE close / lag(close) OVER w - 1.0 END AS ret
  FROM d WINDOW w AS (PARTITION BY k ORDER BY month)
), sg AS (
  SELECT k,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':0'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s0,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':1'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s1,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':2'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s2,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':3'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s3,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':4'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s4,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':5'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s5,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':6'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s6,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':7'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s7,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':8'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s8
  FROM r WHERE ret IS NOT NULL GROUP BY 1
), blk AS (
  SELECT k,
    CASE WHEN s0 > 0 THEN 1 ELSE 0 END + CASE WHEN s1 > 0 THEN 2 ELSE 0 END + CASE WHEN s2 > 0 THEN 4 ELSE 0 END AS b0,
    CASE WHEN s3 > 0 THEN 1 ELSE 0 END + CASE WHEN s4 > 0 THEN 2 ELSE 0 END + CASE WHEN s5 > 0 THEN 4 ELSE 0 END AS b1,
    CASE WHEN s6 > 0 THEN 1 ELSE 0 END + CASE WHEN s7 > 0 THEN 2 ELSE 0 END + CASE WHEN s8 > 0 THEN 4 ELSE 0 END AS b2
  FROM sg
), p AS (
  SELECT a.k AS k1, b.k AS k2, a.month AS t, a.close AS x, b.close AS y
  FROM d a JOIN d b ON a.month = b.month AND a.k < b.k
), fit AS (
  SELECT k1, k2, CAST(count(*) AS BIGINT) AS n_periods,
    CASE WHEN count(*) < 2 OR var_samp(x) = 0 THEN NULL
         ELSE floor(covar_samp(y, x) / var_samp(x) * 1000000 + 0.5) / 1000000 + 0.0
    END AS beta,
    avg(x) AS mx, avg(y) AS my
  FROM p GROUP BY 1, 2
), fit2 AS (
  SELECT k1, k2, n_periods, beta,
    floor((my - beta * mx) * 1000000 + 0.5) / 1000000 + 0.0 AS alpha
  FROM fit
), sp AS (
  SELECT p.k1, p.k2, p.t, p.y - (f.alpha + f.beta * p.x) AS s
  FROM p JOIN fit2 f ON p.k1 = f.k1 AND p.k2 = f.k2
), dd AS (
  SELECT k1, k2, t, s - slag AS ds, slag FROM (
    SELECT k1, k2, t, s, lag(s) OVER (PARTITION BY k1, k2 ORDER BY t) AS slag
    FROM sp)
  WHERE slag IS NOT NULL
), g AS (
  SELECT k1, k2, CAST(count(*) AS BIGINT) AS m,
    CASE WHEN count(*) < 4 OR var_samp(slag) IS NULL OR var_samp(slag) = 0 THEN NULL
         ELSE floor(covar_samp(ds, slag) / var_samp(slag) * 1000000 + 0.5) / 1000000 + 0.0
    END AS gamma,
    avg(ds) AS md, avg(slag) AS ml
  FROM dd GROUP BY 1, 2
), g2 AS (
  SELECT k1, k2, m, gamma,
    floor((md - gamma * ml) * 1000000 + 0.5) / 1000000 + 0.0 AS adf
  FROM g
), res AS (
  SELECT dd.k1, dd.k2,
    sum((ds - (g2.adf + g2.gamma * slag)) * (ds - (g2.adf + g2.gamma * slag))) AS sse,
    var_samp(slag) * (count(*) - 1) AS sxx
  FROM dd JOIN g2 ON dd.k1 = g2.k1 AND dd.k2 = g2.k2
  GROUP BY 1, 2
), tst AS (
  SELECT f.k1, f.k2,
    CASE WHEN g2.gamma IS NULL OR g2.m < 4 OR res.sxx <= 0 OR res.sse <= 0 THEN NULL
         ELSE floor(g2.gamma / sqrt((res.sse / (g2.m - 2)) / res.sxx)
           * 1000000 + 0.5) / 1000000 + 0.0 END AS df_tstat
  FROM fit2 f
  LEFT JOIN g2 ON f.k1 = g2.k1 AND f.k2 = g2.k2
  LEFT JOIN res ON f.k1 = res.k1 AND f.k2 = res.k2
), top20 AS (
  SELECT k1, k2 FROM (
    SELECT k1, k2, row_number() OVER (ORDER BY abs(df_tstat) DESC, k1, k2) AS rk
    FROM tst WHERE df_tstat IS NOT NULL)
  WHERE rk <= 20
), cand1 AS (
  SELECT a.k AS k1, b.k AS k2 FROM blk a JOIN blk b
  ON a.k < b.k AND a.b0 = b.b0
), cand3 AS (
  SELECT a.k AS k1, b.k AS k2 FROM blk a JOIN blk b
  ON a.k < b.k AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2)
)
SELECT 3 AS bits, 1 AS tables,
  (SELECT count(*) FROM cand1) AS candidates,
  CAST(20 AS BIGINT) AS topk,
  (SELECT count(*) FROM top20 t JOIN cand1 c ON t.k1 = c.k1 AND t.k2 = c.k2) AS survived,
  (SELECT count(*) FROM top20 t JOIN cand1 c ON t.k1 = c.k1 AND t.k2 = c.k2) / 20.0 AS recall
UNION ALL
SELECT 3 AS bits, 3 AS tables,
  (SELECT count(*) FROM cand3) AS candidates,
  CAST(20 AS BIGINT) AS topk,
  (SELECT count(*) FROM top20 t JOIN cand3 c ON t.k1 = c.k1 AND t.k2 = c.k2) AS survived,
  (SELECT count(*) FROM top20 t JOIN cand3 c ON t.k1 = c.k1 AND t.k2 = c.k2) / 20.0 AS recall
ORDER BY tables""",

    // dead-letter lanes: the corruption injection is deterministic
    // arithmetic on o_orderkey, so every lane's count and volume total
    // is predictable WITHOUT parsing — the oracle checks that the
    // engine's parse/route actually lands each payload where the
    // construction says it must (same CASE precedence both sides).
    "q218_dead_letters" ->
      """WITH r AS (
  SELECT o_orderkey % 13 AS m, o_orderkey % 50 AS v FROM orders
), lanes AS (
  SELECT CASE WHEN m = 0 THEN 'malformed_json'
              WHEN m = 1 THEN 'missing_key'
              WHEN v = 0 THEN 'gate_volume'
              ELSE 'good' END AS lane,
    CASE WHEN m = 0 THEN NULL ELSE v END AS vol
  FROM r
)
SELECT lane, CAST(count(*) AS BIGINT) AS n,
  CAST(coalesce(sum(vol), 0) AS BIGINT) AS total_volume
FROM lanes GROUP BY 1""",

    // dead-letter replay: every stage count is pure arithmetic on
    // o_orderkey (m = %7 picks the corruption, v = %50 the volume gate),
    // so the oracle predicts the whole corrupt->route->repair->replay
    // chain without parsing; id_parity is the engine-side multiset
    // verdict (union of first-pass good + replayed == clean run),
    // predicted true.
    "q221_dlq_replay" ->
      """WITH r AS (
  SELECT o_orderkey % 7 AS m, o_orderkey % 50 AS v FROM orders
)
SELECT 'clean_good' AS stage, CAST(count(*) AS BIGINT) AS n, true AS id_parity
FROM r WHERE v <> 0
UNION ALL
SELECT 'corrupt_good', CAST(count(*) AS BIGINT), true
FROM r WHERE m NOT IN (0, 1) AND v <> 0
UNION ALL
SELECT 'dead_repairable', CAST(count(*) AS BIGINT), true
FROM r WHERE m IN (0, 1)
UNION ALL
SELECT 'replayed_good', CAST(count(*) AS BIGINT), true
FROM r WHERE m IN (0, 1) AND v <> 0
UNION ALL
SELECT 'union_good', CAST(count(*) AS BIGINT), true
FROM r WHERE v <> 0""",

    // matryoshka truncation recall: both rankings exact SQL (sliced
    // dot products, q24's left-to-right list_sum order and rounded-
    // score ranking with vec_id ties), so the recall NUMBER itself is
    // oracle-checked — no verdict bit needed.
    "q217_matryoshka_recall" ->
      """WITH qv AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5
), pairs AS (
  SELECT q.qid, e.vec_id AS nid, q.qe, e.embedding AS ne
  FROM qv q, embeddings e WHERE e.vec_id <> q.qid
), scored AS (
  SELECT qid, nid, d,
    floor(dp / (na * nb) * 1000000 + 0.5) / 1000000 + 0.0 AS s
  FROM (
    SELECT qid, nid, d,
      list_sum(list_transform(range(1, d + 1), i -> CAST(qe[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE))) AS dp,
      sqrt(list_sum(list_transform(range(1, d + 1), i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))) AS na,
      sqrt(list_sum(list_transform(range(1, d + 1), i -> CAST(ne[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE)))) AS nb
    FROM pairs, (SELECT unnest([64, 32, 16]) AS d))
), ranked AS (
  SELECT qid, nid, d,
    row_number() OVER (PARTITION BY d, qid ORDER BY s DESC, nid) AS rk
  FROM scored
), tops AS (
  SELECT qid, nid, d FROM ranked WHERE rk <= 10
)
SELECT t.d AS trunc_dim, CAST(50 AS BIGINT) AS topk_total,
  CAST(count(f.nid) AS BIGINT) AS matched,
  CAST(count(f.nid) AS BIGINT) / 50.0 AS recall
FROM (SELECT * FROM tops WHERE d <> 64) t
LEFT JOIN (SELECT * FROM tops WHERE d = 64) f
  ON t.qid = f.qid AND t.nid = f.nid
GROUP BY t.d""",

    // structured-matryoshka recall: the corpus itself is replicated
    // (md5-uniform per (vec_id, dim), centered, divided by the exact
    // power-of-two 2^((i-1)//8)), then the same exact-cosine ranking
    // and recall arithmetic as q217 — the oracle checks the vectors,
    // the recall NUMBER, and the truncate-here verdicts.
    "q222_matryoshka_structured" ->
      """WITH v AS (
  SELECT vec_id,
    list_transform(range(1, 65), i ->
      ((CAST(('0x' || substr(md5('mrl:' || vec_id || ':' || i), 1, 15)) AS BIGINT)
        / 1152921504606846976.0) - 0.5)
      / CAST(1 << ((i - 1) // 8) AS DOUBLE)) AS e
  FROM embeddings
), qv AS (
  SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 5
), pairs AS (
  SELECT q.qid, c.vec_id AS nid, q.qe, c.e AS ne
  FROM qv q, v c WHERE c.vec_id <> q.qid
), scored AS (
  SELECT qid, nid, d,
    floor(dp / (na * nb) * 1000000 + 0.5) / 1000000 + 0.0 AS s
  FROM (
    SELECT qid, nid, d,
      list_sum(list_transform(range(1, d + 1), i -> qe[i] * ne[i])) AS dp,
      sqrt(list_sum(list_transform(range(1, d + 1), i -> qe[i] * qe[i]))) AS na,
      sqrt(list_sum(list_transform(range(1, d + 1), i -> ne[i] * ne[i]))) AS nb
    FROM pairs, (SELECT unnest([64, 32, 16]) AS d))
), ranked AS (
  SELECT qid, nid, d,
    row_number() OVER (PARTITION BY d, qid ORDER BY s DESC, nid) AS rk
  FROM scored
), tops AS (
  SELECT qid, nid, d FROM ranked WHERE rk <= 10
), rec AS (
  SELECT t.d AS trunc_dim, CAST(50 AS BIGINT) AS topk_total,
    CAST(count(f.nid) AS BIGINT) AS matched,
    CAST(count(f.nid) AS BIGINT) / 50.0 AS recall
  FROM (SELECT * FROM tops WHERE d <> 64) t
  LEFT JOIN (SELECT * FROM tops WHERE d = 64) f
    ON t.qid = f.qid AND t.nid = f.nid
  GROUP BY t.d
)
SELECT trunc_dim, topk_total, matched, recall,
  CASE WHEN trunc_dim = 32 THEN 0.8 ELSE 0.5 END AS threshold,
  recall >= (CASE WHEN trunc_dim = 32 THEN 0.8 ELSE 0.5 END) AS recall_ok
FROM rec""",

    // 3-D Z-order compaction: the q216 pattern at k=3 — content
    // predicted from orders per predicate; all THREE dimensions must
    // earn the pruned_ok verdict on one layout.
    "q223_zorder3_compact" ->
      """SELECT 'year_1995' AS predicate, CAST(count(*) AS BIGINT) AS n,
  round(sum(o_totalprice), 2) AS total, true AS pruned_ok
FROM orders WHERE o_orderkey % 2 = 0 AND year(o_orderdate) = 1995
UNION ALL
SELECT 'price_ge_400k', CAST(count(*) AS BIGINT),
  round(sum(o_totalprice), 2), true
FROM orders WHERE o_orderkey % 2 = 0 AND o_totalprice >= 400000.0
UNION ALL
SELECT 'band_10_14', CAST(count(*) AS BIGINT),
  round(sum(o_totalprice), 2), true
FROM orders WHERE o_orderkey % 2 = 0 AND o_custkey % 100 BETWEEN 10 AND 14""",

    // corporate-action back-adjustment: per-event factors sr6-round
    // BEFORE the product; the fold runs LEFT TO RIGHT over the
    // time-ascending event list in both engines (Spark `aggregate`,
    // DuckDB list_reduce with a prepended 1.0 accumulator — DuckDB's
    // list_reduce rejects empty lists), so adjusted closes are
    // bit-identical with no rounding at emission.
    "q224_adjusted_close" ->
      """WITH b AS (
  SELECT l_suppkey, strftime(l_shipdate, '%Y-%m') AS month,
    max(l_extendedprice) AS close
  FROM lineitem WHERE l_suppkey <= 30 GROUP BY 1, 2
), e AS (
  SELECT l_suppkey, month, close,
    CASE WHEN substr(month, 6, 2) = '06' THEN floor(close) / 1000.0
         ELSE 0.0 END AS div,
    CASE WHEN substr(month, 6, 2) = '01' AND l_suppkey % 3 = 0 THEN 2.0
         ELSE 0.0 END AS spl,
    lag(close) OVER (PARTITION BY l_suppkey ORDER BY month) AS prev
  FROM b
), f AS (
  SELECT l_suppkey, month,
    floor(((CASE WHEN div = 0 OR prev IS NULL THEN 1.0
                 ELSE 1.0 - div / prev END)
      / (CASE WHEN spl > 0 THEN spl ELSE 1.0 END)) * 1000000 + 0.5)
      / 1000000 + 0.0 AS fct
  FROM e WHERE div > 0 OR (spl > 0 AND spl <> 1.0)
), ev AS (
  SELECT l_suppkey, list(struct_pack(t := month, f := fct) ORDER BY month) AS evs
  FROM f GROUP BY 1
)
SELECT b.l_suppkey, b.month, b.close,
  b.close * list_reduce(
    list_prepend(CAST(1.0 AS DOUBLE),
      CASE WHEN ev.evs IS NULL THEN CAST([] AS DOUBLE[])
           ELSE list_transform(list_filter(ev.evs, x -> x.t > b.month),
                               x -> x.f) END),
    (a, x) -> a * x) AS adj_close
FROM b LEFT JOIN ev USING (l_suppkey)""",

    // 2-D Z-order compaction: content predicted from orders per
    // predicate; pruned_ok is the engine-side scanned<live verdict the
    // Z-curve layout must earn on BOTH dimensions (the q164 pattern).
    "q216_zorder_compact" ->
      """SELECT 'year_1995' AS predicate, CAST(count(*) AS BIGINT) AS n,
  round(sum(o_totalprice), 2) AS total, true AS pruned_ok
FROM orders WHERE year(o_orderdate) = 1995
UNION ALL
SELECT 'price_ge_400k', CAST(count(*) AS BIGINT),
  round(sum(o_totalprice), 2), true
FROM orders WHERE o_totalprice >= 400000.0""",

    // repeated n-gram spans: word_ngrams semantics (lowercase, \s+
    // split, 8-token windows joined by one space) replicated as list
    // slices; duplication is a cross-doc distinct count; the span merge
    // (windows within 7 positions coalesce) is the same lag/cumsum
    // arithmetic in both engines — all-integer output, zero rounding.
    "q214_repeated_spans" ->
      """WITH tk AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
  FROM documents
), grams AS (
  SELECT doc_id, i AS pos, array_to_string(t[i+1:i+8], ' ') AS gram
  FROM tk, LATERAL (SELECT unnest(range(0, len(t) - 7)) AS i) r
  WHERE len(t) >= 8
), dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), mk AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)
), sp AS (
  SELECT doc_id, pos,
    CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 7 THEN 1 ELSE 0 END AS brk
  FROM mk WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), sp2 AS (
  SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
  FROM sp
), spans AS (
  SELECT doc_id, span_id, min(pos) AS lo, max(pos) AS hi FROM sp2 GROUP BY 1, 2
), per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
    CAST(sum(hi - lo + 8) AS BIGINT) AS covered_tokens
  FROM spans GROUP BY 1
), tot AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM grams GROUP BY 1
), dupc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams FROM mk GROUP BY 1
)
SELECT t.doc_id, t.n_grams, d.n_dup_grams, p.n_spans, p.covered_tokens
FROM tot t JOIN dupc d USING (doc_id) JOIN per p USING (doc_id)""",

    // substring-dedup CUT: keep-first keeper per duplicated gram (the
    // row_number over (doc_id, pos)), position sets as EXCEPT, kept-wins
    // overlap protection, and the rewritten text rebuilt byte-exactly
    // from the ORIGINAL-case token list — all integers and exact
    // strings, zero rounding.
    "q219_span_cut" ->
      """WITH tk AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS ot,
    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
  FROM documents
), grams AS (
  SELECT doc_id, i AS pos, array_to_string(t[i+1:i+8], ' ') AS gram
  FROM tk, LATERAL (SELECT unnest(range(0, len(t) - 7)) AS i) r
  WHERE len(t) >= 8
), dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), mk AS (
  SELECT g.doc_id, g.pos,
    row_number() OVER (PARTITION BY g.gram ORDER BY g.doc_id, g.pos) AS rn
  FROM grams g JOIN dup USING (gram)
), keptp AS (
  SELECT DISTINCT doc_id, pos + u AS p
  FROM mk, LATERAL (SELECT unnest(range(0, 8)) AS u) s WHERE rn = 1
), cutp AS (
  SELECT DISTINCT doc_id, pos + u AS p
  FROM mk, LATERAL (SELECT unnest(range(0, 8)) AS u) s WHERE rn > 1
), rem AS (
  SELECT doc_id, p FROM cutp EXCEPT SELECT doc_id, p FROM keptp
), sp AS (
  SELECT doc_id, p,
    CASE WHEN lag(p) OVER w IS NULL OR p > lag(p) OVER w + 1 THEN 1 ELSE 0 END AS brk
  FROM rem WINDOW w AS (PARTITION BY doc_id ORDER BY p)
), st AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS tokens_removed,
    CAST(sum(brk) AS BIGINT) AS n_spans_cut, list(p) AS rm
  FROM sp GROUP BY 1
)
SELECT tk.doc_id, CAST(len(tk.ot) AS BIGINT) AS n_tokens,
  st.tokens_removed, st.n_spans_cut,
  -- array_to_string(NULL-on-empty): a fully-excised doc must read ''
  coalesce(array_to_string(
    list_transform(
      list_filter(range(0, len(tk.ot)), i -> NOT list_contains(st.rm, i)),
      i -> tk.ot[i + 1]), ' '), '') AS rewritten
FROM tk JOIN st USING (doc_id)""",

    // the cut composed into the curation chain: per-stage doc/token
    // yields; exact dedup keys on the REWRITTEN text (md5 equality ==
    // string equality), keep-lowest-doc_id; quality gate at 50
    // surviving tokens.
    "q220_cut_curation" ->
      """WITH tk AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS ot,
    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
  FROM documents
), grams AS (
  SELECT doc_id, i AS pos, array_to_string(t[i+1:i+8], ' ') AS gram
  FROM tk, LATERAL (SELECT unnest(range(0, len(t) - 7)) AS i) r
  WHERE len(t) >= 8
), dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), mk AS (
  SELECT g.doc_id, g.pos,
    row_number() OVER (PARTITION BY g.gram ORDER BY g.doc_id, g.pos) AS rn
  FROM grams g JOIN dup USING (gram)
), keptp AS (
  SELECT DISTINCT doc_id, pos + u AS p
  FROM mk, LATERAL (SELECT unnest(range(0, 8)) AS u) s WHERE rn = 1
), cutp AS (
  SELECT DISTINCT doc_id, pos + u AS p
  FROM mk, LATERAL (SELECT unnest(range(0, 8)) AS u) s WHERE rn > 1
), rem AS (
  SELECT doc_id, p FROM cutp EXCEPT SELECT doc_id, p FROM keptp
), st AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS tokens_removed, list(p) AS rm
  FROM rem GROUP BY 1
), aft AS (
  SELECT tk.doc_id, CAST(len(tk.ot) AS BIGINT) AS n_tokens,
    CAST(len(tk.ot) AS BIGINT) - coalesce(st.tokens_removed, 0) AS tokens_after,
    coalesce(array_to_string(
      list_transform(
        list_filter(range(0, len(tk.ot)),
          i -> NOT list_contains(coalesce(st.rm, CAST([] AS BIGINT[])), i)),
        i -> tk.ot[i + 1]), ' '), '') AS rewritten
  FROM tk LEFT JOIN st USING (doc_id)
), ddp AS (
  SELECT doc_id, n_tokens, tokens_after,
    row_number() OVER (PARTITION BY rewritten ORDER BY doc_id) AS rn
  FROM aft
)
SELECT 'raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM aft
UNION ALL
SELECT 'span_cut', CAST(count(*) AS BIGINT),
  CAST(sum(tokens_after) AS BIGINT) FROM aft
UNION ALL
SELECT 'exact_dedup', CAST(count(*) AS BIGINT),
  CAST(sum(tokens_after) AS BIGINT) FROM ddp WHERE rn = 1
UNION ALL
SELECT 'quality', CAST(count(*) AS BIGINT),
  CAST(sum(tokens_after) AS BIGINT) FROM ddp WHERE rn = 1 AND tokens_after >= 50""",

    // DSIR importance weights: per-token log terms are pure functions
    // of exact integer counts (identical IEEE both engines); the group
    // sum accumulates engine-order -> the weight rounds (sr6) once at
    // emission and the top-20 ranks on the ROUNDED value with doc_id
    // ties (the q146 surprisal discipline).
    "q215_dsir_weights" ->
      """WITH tk AS (
  SELECT doc_id, lang,
    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> len(x) > 0) AS t
  FROM documents
), toks AS (
  SELECT doc_id, (lang = 'en') AS tgt, unnest(t) AS tok FROM tk
), stats AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS sc,
    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS tc
  FROM toks GROUP BY 1
), tot AS (
  SELECT CAST(sum(sc) AS BIGINT) AS sN, CAST(sum(tc) AS BIGINT) AS tN,
    CAST(count(*) AS BIGINT) AS V
  FROM stats
), pt AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
), wts AS (
  SELECT p.doc_id, CAST(sum(p.c) AS BIGINT) AS n_tokens,
    floor((sum(CAST(p.c AS DOUBLE) * (ln(CAST(s.tc AS DOUBLE) + 1.0) - ln(CAST(s.sc AS DOUBLE) + 1.0)))
      + CAST(sum(p.c) AS BIGINT) * (ln(CAST(tot.sN AS DOUBLE) + CAST(tot.V AS DOUBLE)) - ln(CAST(tot.tN AS DOUBLE) + CAST(tot.V AS DOUBLE))))
      * 1000000 + 0.5) / 1000000 + 0.0 AS dsir_weight
  FROM pt p JOIN stats s USING (tok) CROSS JOIN tot
  GROUP BY p.doc_id, tot.sN, tot.tN, tot.V
)
SELECT doc_id, n_tokens, dsir_weight, rank FROM (
  SELECT doc_id, n_tokens, dsir_weight,
    CAST(row_number() OVER (ORDER BY dsir_weight DESC, doc_id) AS INT) AS rank
  FROM wts)
WHERE rank <= 20""",

    // Tx RESTORE: each stage's content predicted from the source table
    // (v1 = low-year rows + doubled high-year rows; restored = v0);
    // restore_exact is the engine-side symmetric-exceptAll verdict the
    // oracle predicts true. Doubling before or after the sum is exact
    // (x2 is an exponent bump); round(.,2) absorbs engine-order ULPs.
    "q211_tx_restore" ->
      """WITH lo AS (
  SELECT CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS t
  FROM orders WHERE year(o_orderdate) <= 1997
), hi AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(o_totalprice) * 2 AS t
  FROM orders WHERE year(o_orderdate) >= 1998
)
SELECT 'v0' AS stage, lo.n, lo.t AS total, true AS restore_exact FROM lo
UNION ALL
SELECT 'v1', lo.n + hi.n,
  round((SELECT sum(o_totalprice) FROM orders WHERE year(o_orderdate) <= 1997) + hi.t, 2),
  true FROM lo, hi
UNION ALL
SELECT 'restored', lo.n, lo.t, true FROM lo""",

    // blocked Dickey-Fuller: q208's block machinery + q187's hedge-fit
    // chain, then the DF regression replicated IN FULL — gamma and the
    // DF intercept round (sr6) before the residual pass (identical
    // per-row doubles both engines), SSE/Sxx accumulate engine-order,
    // the t rounds once at emission (the rho discipline).
    "q210_dickey_fuller" ->
      """WITH d AS (
  SELECT l_suppkey AS k, strftime(l_shipdate, '%Y-%m') AS month,
    max(l_extendedprice) AS close
  FROM lineitem WHERE l_suppkey <= 100 GROUP BY 1, 2
), r AS (
  SELECT k, month,
    CASE WHEN lag(close) OVER w = 0 THEN NULL
         ELSE close / lag(close) OVER w - 1.0 END AS ret
  FROM d WINDOW w AS (PARTITION BY k ORDER BY month)
), sg AS (
  SELECT k,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':0'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s0,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':1'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s1,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':2'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s2
  FROM r WHERE ret IS NOT NULL GROUP BY 1
), blk AS (
  SELECT k, CASE WHEN s0 > 0 THEN 1 ELSE 0 END
          + CASE WHEN s1 > 0 THEN 2 ELSE 0 END
          + CASE WHEN s2 > 0 THEN 4 ELSE 0 END AS pair_block
  FROM sg
), p AS (
  SELECT a.k AS k1, b.k AS k2, a.month AS t, a.close AS x, b.close AS y
  FROM d a JOIN d b ON a.month = b.month AND a.k < b.k
  JOIN blk ba ON ba.k = a.k
  JOIN blk bb ON bb.k = b.k AND bb.pair_block = ba.pair_block
), fit AS (
  SELECT k1, k2, CAST(count(*) AS BIGINT) AS n_periods,
    CASE WHEN count(*) < 2 OR var_samp(x) = 0 THEN NULL
         ELSE floor(covar_samp(y, x) / var_samp(x) * 1000000 + 0.5) / 1000000 + 0.0
    END AS beta,
    avg(x) AS mx, avg(y) AS my
  FROM p GROUP BY 1, 2
), fit2 AS (
  SELECT k1, k2, n_periods, beta,
    floor((my - beta * mx) * 1000000 + 0.5) / 1000000 + 0.0 AS alpha
  FROM fit
), sp AS (
  SELECT p.k1, p.k2, p.t, p.y - (f.alpha + f.beta * p.x) AS s
  FROM p JOIN fit2 f ON p.k1 = f.k1 AND p.k2 = f.k2
), dd AS (
  SELECT k1, k2, t, s - slag AS ds, slag FROM (
    SELECT k1, k2, t, s, lag(s) OVER (PARTITION BY k1, k2 ORDER BY t) AS slag
    FROM sp)
  WHERE slag IS NOT NULL
), g AS (
  SELECT k1, k2, CAST(count(*) AS BIGINT) AS m,
    CASE WHEN count(*) < 4 OR var_samp(slag) IS NULL OR var_samp(slag) = 0 THEN NULL
         ELSE floor(covar_samp(ds, slag) / var_samp(slag) * 1000000 + 0.5) / 1000000 + 0.0
    END AS gamma,
    avg(ds) AS md, avg(slag) AS ml
  FROM dd GROUP BY 1, 2
), g2 AS (
  SELECT k1, k2, m, gamma,
    floor((md - gamma * ml) * 1000000 + 0.5) / 1000000 + 0.0 AS adf
  FROM g
), res AS (
  SELECT dd.k1, dd.k2,
    sum((ds - (g2.adf + g2.gamma * slag)) * (ds - (g2.adf + g2.gamma * slag))) AS sse,
    var_samp(slag) * (count(*) - 1) AS sxx
  FROM dd JOIN g2 ON dd.k1 = g2.k1 AND dd.k2 = g2.k2
  GROUP BY 1, 2
)
SELECT f.k1, f.k2, f.n_periods, f.beta, f.alpha, g2.gamma,
  CASE WHEN g2.gamma IS NULL OR g2.m < 4 OR res.sxx <= 0 OR res.sse <= 0 THEN NULL
       ELSE floor(g2.gamma / sqrt((res.sse / (g2.m - 2)) / res.sxx)
         * 1000000 + 0.5) / 1000000 + 0.0 END AS df_tstat
FROM fit2 f
LEFT JOIN g2 ON f.k1 = g2.k1 AND f.k2 = g2.k2
LEFT JOIN res ON f.k1 = res.k1 AND f.k2 = res.k2""",

    // blocked lead-lag: identical block machinery to q208; the pair
    // overlap counts on the RETURN frame (first month per key drops),
    // n_match is engine-side blocked==full equality over every ccf
    // column, oracle-predicted = n_pairs. The ccf math itself is
    // q201's oracle-pinned construction.
    "q209_blocked_leadlag" ->
      """WITH d AS (
  SELECT l_suppkey AS k, strftime(l_shipdate, '%Y-%m') AS month,
    max(l_extendedprice) AS close
  FROM lineitem WHERE l_suppkey <= 100 GROUP BY 1, 2
), r AS (
  SELECT k, month,
    CASE WHEN lag(close) OVER w = 0 THEN NULL
         ELSE close / lag(close) OVER w - 1.0 END AS ret
  FROM d WINDOW w AS (PARTITION BY k ORDER BY month)
), sg AS (
  SELECT k,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':0'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s0,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':1'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s1,
    sum(CAST(floor(ret * (CAST(('0x' || substr(md5(month || ':2'), 1, 15)) AS BIGINT) / 1152921504606846976.0 - 0.5) * 1000000 + 0.5) AS BIGINT)) AS s2
  FROM r WHERE ret IS NOT NULL GROUP BY 1
), blk AS (
  SELECT k, CASE WHEN s0 > 0 THEN 1 ELSE 0 END
          + CASE WHEN s1 > 0 THEN 2 ELSE 0 END
          + CASE WHEN s2 > 0 THEN 4 ELSE 0 END AS pair_block
  FROM sg
), p AS (
  SELECT ba.pair_block, a.k AS k1, b.k AS k2
  FROM r a JOIN r b ON a.month = b.month AND a.k < b.k
  JOIN blk ba ON ba.k = a.k
  JOIN blk bb ON bb.k = b.k AND bb.pair_block = ba.pair_block
  WHERE a.ret IS NOT NULL AND b.ret IS NOT NULL
), pb AS (
  SELECT pair_block, k1, k2, CAST(count(*) AS BIGINT) AS np FROM p GROUP BY 1, 2, 3
), per AS (
  SELECT pair_block, CAST(count(*) AS BIGINT) AS n_pairs,
    CAST(count(*) AS BIGINT) AS n_match,
    CAST(sum(np) AS BIGINT) AS sum_n_periods
  FROM pb GROUP BY 1
), kb AS (
  SELECT pair_block, CAST(count(*) AS BIGINT) AS n_keys FROM blk GROUP BY 1
), tot AS (
  SELECT CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS full_pairs FROM blk
), bt AS (
  SELECT CAST(coalesce(sum(n_pairs), 0) AS BIGINT) AS bp FROM per
)
SELECT kb.pair_block, kb.n_keys,
  CAST(coalesce(per.n_pairs, 0) AS BIGINT) AS n_pairs,
  CAST(coalesce(per.n_match, 0) AS BIGINT) AS n_match,
  CAST(coalesce(per.sum_n_periods, 0) AS BIGINT) AS sum_n_periods,
  tot.full_pairs,
  floor(CAST(bt.bp AS DOUBLE) / CAST(tot.full_pairs AS DOUBLE) * 1000000 + 0.5) / 1000000 AS candidate_reduction
FROM kb LEFT JOIN per USING (pair_block), tot, bt""",

    // momentum backtest: daily close frame, 5-day momentum signal
    // LAGGED one day, quintiles over the (sig DESC, user_id) total
    // order; the spread floor-rounds to BIGINT micro-units before the
    // cumulative sum so compounding is exact integer arithmetic
    // (DuckDB's windowed double sum uses segment-tree addition order)
    "q188_momentum_backtest" ->
      """WITH d AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, arg_max(value, ts) AS close
  FROM events GROUP BY 1, 2
), r AS (
  SELECT user_id, day,
    CASE WHEN lag(close) OVER (PARTITION BY user_id ORDER BY day) = 0 THEN NULL
         ELSE close / lag(close) OVER (PARTITION BY user_id ORDER BY day) - 1.0
    END AS ret,
    CASE WHEN lag(close, 5) OVER (PARTITION BY user_id ORDER BY day) = 0 THEN NULL
         ELSE close / lag(close, 5) OVER (PARTITION BY user_id ORDER BY day) - 1.0
    END AS mom
  FROM d
), s AS (
  SELECT user_id, day, ret,
    lag(mom) OVER (PARTITION BY user_id ORDER BY day) AS sig
  FROM r
), b AS (
  SELECT user_id, day, ret,
    ntile(5) OVER (PARTITION BY day ORDER BY sig DESC, user_id) AS bkt
  FROM s WHERE sig IS NOT NULL AND ret IS NOT NULL
), p AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_universe,
    avg(CASE WHEN bkt = 1 THEN ret END) AS lr,
    avg(CASE WHEN bkt = 5 THEN ret END) AS sr
  FROM b GROUP BY day
), q AS (
  SELECT day, n_universe,
    floor(lr * 1000000 + 0.5) / 1000000 + 0.0 AS long_ret,
    floor(sr * 1000000 + 0.5) / 1000000 + 0.0 AS short_ret,
    CASE WHEN lr IS NOT NULL AND sr IS NOT NULL
         THEN CAST(floor((lr - sr) * 1000000 + 0.5) AS BIGINT) END AS ls_micro
  FROM p
)
SELECT day, n_universe, long_ret, short_ret,
  CAST(ls_micro AS DOUBLE) / CAST(1000000 AS DOUBLE) AS ls_ret,
  CAST(CAST(sum(ls_micro) OVER (ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)
    / CAST(1000000 AS DOUBLE) AS cum_ls
FROM q""",

    // graft_tx_range SQL surface: band aggregate is plain SQL over
    // orders; pruned_ok is structural (cluster-compacted layout must
    // scan a strict subset for the band)
    // Newey-West: candle returns, five lag columns, every gamma_j
    // expanded to pair sums; Bartlett weights are the same IEEE
    // expression (1 - j/6) both engines; the lrv fold is left-assoc in
    // the identical order; moment sums -> sr6 at emission
    "q191_newey_west" ->
      """WITH cd AS (
  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
    arg_max(value, event_id) AS cl
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, bucket_start, ret FROM (
    SELECT event_type, bucket_start,
      CASE WHEN lag(cl) OVER (PARTITION BY event_type ORDER BY bucket_start) = 0 THEN NULL
           ELSE cl / lag(cl) OVER (PARTITION BY event_type ORDER BY bucket_start) - 1.0
      END AS ret
    FROM cd
  ) WHERE ret IS NOT NULL
), lg AS (
  SELECT event_type, ret,
    lag(ret, 1) OVER w AS l1, lag(ret, 2) OVER w AS l2,
    lag(ret, 3) OVER w AS l3, lag(ret, 4) OVER w AS l4,
    lag(ret, 5) OVER w AS l5
  FROM r WINDOW w AS (PARTITION BY event_type ORDER BY bucket_start)
), a AS (
  SELECT event_type, CAST(count(ret) AS BIGINT) AS n, avg(ret) AS mu,
    sum(ret * ret) AS sxx,
    sum(ret * l1) AS sxy1, sum(CASE WHEN l1 IS NOT NULL THEN ret END) AS sx1,
    sum(l1) AS sy1, CAST(count(l1) AS BIGINT) AS np1,
    sum(ret * l2) AS sxy2, sum(CASE WHEN l2 IS NOT NULL THEN ret END) AS sx2,
    sum(l2) AS sy2, CAST(count(l2) AS BIGINT) AS np2,
    sum(ret * l3) AS sxy3, sum(CASE WHEN l3 IS NOT NULL THEN ret END) AS sx3,
    sum(l3) AS sy3, CAST(count(l3) AS BIGINT) AS np3,
    sum(ret * l4) AS sxy4, sum(CASE WHEN l4 IS NOT NULL THEN ret END) AS sx4,
    sum(l4) AS sy4, CAST(count(l4) AS BIGINT) AS np4,
    sum(ret * l5) AS sxy5, sum(CASE WHEN l5 IS NOT NULL THEN ret END) AS sx5,
    sum(l5) AS sy5, CAST(count(l5) AS BIGINT) AS np5
  FROM lg GROUP BY 1
), m AS (
  SELECT event_type, n, mu,
    (sxx - CAST(n AS DOUBLE) * (mu * mu)) / CAST(n AS DOUBLE) AS g0,
    (sxy1 - mu * (sx1 + sy1) + CAST(np1 AS DOUBLE) * (mu * mu)) / CAST(n AS DOUBLE) AS g1,
    (sxy2 - mu * (sx2 + sy2) + CAST(np2 AS DOUBLE) * (mu * mu)) / CAST(n AS DOUBLE) AS g2,
    (sxy3 - mu * (sx3 + sy3) + CAST(np3 AS DOUBLE) * (mu * mu)) / CAST(n AS DOUBLE) AS g3,
    (sxy4 - mu * (sx4 + sy4) + CAST(np4 AS DOUBLE) * (mu * mu)) / CAST(n AS DOUBLE) AS g4,
    (sxy5 - mu * (sx5 + sy5) + CAST(np5 AS DOUBLE) * (mu * mu)) / CAST(n AS DOUBLE) AS g5
  FROM a
), v AS (
  SELECT event_type, n, mu, g0,
    g0 + 2.0 * (1.0 - 1.0 / 6.0) * g1 + 2.0 * (1.0 - 2.0 / 6.0) * g2
       + 2.0 * (1.0 - 3.0 / 6.0) * g3 + 2.0 * (1.0 - 4.0 / 6.0) * g4
       + 2.0 * (1.0 - 5.0 / 6.0) * g5 AS lrv
  FROM m
)
SELECT event_type, n,
  floor(mu * 1000000 + 0.5) / 1000000 + 0.0 AS mean,
  CASE WHEN n <= 5 OR NOT (g0 > 0) THEN NULL
       ELSE floor(mu / sqrt(g0 / CAST(n AS DOUBLE)) * 1000000 + 0.5) / 1000000 + 0.0
  END AS t_iid,
  CASE WHEN n <= 5 OR NOT (lrv > 0) THEN NULL
       ELSE floor(mu / sqrt(lrv / CAST(n AS DOUBLE)) * 1000000 + 0.5) / 1000000 + 0.0
  END AS t_nw
FROM v""",

    // risk attribution: q187's daily close frame -> returns -> full
    // pairwise covariance matrix, each entry quantized to pico-unit
    // BIGINTs so row sums / the grand total are exact integers and
    // var_p / mcr / risk_share are identical doubles with NO emission
    // rounding
    "q190_risk_contrib" ->
      """WITH cd AS (
  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
    arg_max(value, event_id) AS cl
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, strftime(date_trunc('day', bucket_start), '%Y-%m-%d') AS day,
    arg_max(cl, bucket_start) AS close
  FROM cd GROUP BY 1, 2
), r AS (
  SELECT event_type, day, ret FROM (
    SELECT event_type, day,
      CASE WHEN lag(close) OVER (PARTITION BY event_type ORDER BY day) = 0 THEN NULL
           ELSE close / lag(close) OVER (PARTITION BY event_type ORDER BY day) - 1.0
      END AS ret
    FROM d
  ) WHERE ret IS NOT NULL
), p AS (
  SELECT a.event_type AS ki, b.event_type AS kj,
    covar_samp(a.ret, b.ret) AS c
  FROM r a JOIN r b ON a.day = b.day GROUP BY 1, 2
), q AS (
  SELECT ki, kj,
    CAST(floor(c * CAST(1000000000000 AS DOUBLE) + 0.5) AS BIGINT) AS cp
  FROM p
), rs AS (
  SELECT ki, CAST(sum(cp) AS BIGINT) AS rsum, CAST(count(*) AS BIGINT) AS nk
  FROM q GROUP BY 1
), t AS (
  SELECT ki, rsum, nk, CAST(sum(rsum) OVER () AS BIGINT) AS tot FROM rs
)
SELECT ki AS event_type, nk AS n_keys,
  (CAST(tot AS DOUBLE) / CAST(1000000000000 AS DOUBLE))
    / CAST(nk * nk AS DOUBLE) AS var_p,
  CASE WHEN (CAST(tot AS DOUBLE) / CAST(1000000000000 AS DOUBLE))
         / CAST(nk * nk AS DOUBLE) > 0
       THEN ((CAST(rsum AS DOUBLE) / CAST(1000000000000 AS DOUBLE))
           / CAST(nk * nk AS DOUBLE))
         / sqrt((CAST(tot AS DOUBLE) / CAST(1000000000000 AS DOUBLE))
           / CAST(nk * nk AS DOUBLE))
       ELSE NULL END AS mcr,
  CASE WHEN tot <> 0
       THEN CAST(rsum AS DOUBLE) / CAST(tot AS DOUBLE)
       ELSE NULL END AS risk_share
FROM t""",

    // participation curve: candle volumes, day-window share, (key,
    // slot) mean/sd of the share; engine-order aggregates -> sr6
    "q198_participation_curve" ->
      """WITH cd AS (
  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
    sum(value) AS volume
  FROM events GROUP BY 1, 2
), sh AS (
  SELECT event_type,
    strftime(date_trunc('day', bucket_start), '%Y-%m-%d') AS day,
    strftime(bucket_start, '%H:%M') AS slot,
    CASE WHEN sum(volume) OVER (PARTITION BY event_type,
           date_trunc('day', bucket_start)) = 0 THEN NULL
         ELSE volume / sum(volume) OVER (PARTITION BY event_type,
           date_trunc('day', bucket_start))
    END AS share
  FROM cd
)
SELECT event_type, slot, CAST(count(share) AS BIGINT) AS n_days,
  floor(avg(share) * 1000000 + 0.5) / 1000000 + 0.0 AS mean_share,
  CASE WHEN count(share) < 2 THEN NULL
       ELSE floor(stddev_samp(share) * 1000000 + 0.5) / 1000000 + 0.0
  END AS sd_share
FROM sh GROUP BY 1, 2""",

    // lead-lag CCF: q187's pair frame on RETURNS, all shifts per pair,
    // guarded covar/stddev Pearson restricted to aligned pairs (q167's
    // ANSI disposition), sr6 at emission
    "q201_lead_lag" ->
      """WITH cd AS (
  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
    arg_max(value, event_id) AS cl
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, strftime(date_trunc('day', bucket_start), '%Y-%m-%d') AS day,
    arg_max(cl, bucket_start) AS close
  FROM cd GROUP BY 1, 2
), r AS (
  SELECT event_type, day, ret FROM (
    SELECT event_type, day,
      CASE WHEN lag(close) OVER (PARTITION BY event_type ORDER BY day) = 0 THEN NULL
           ELSE close / lag(close) OVER (PARTITION BY event_type ORDER BY day) - 1.0
      END AS ret
    FROM d
  ) WHERE ret IS NOT NULL
), p AS (
  SELECT a.event_type AS k1, b.event_type AS k2, a.day AS t,
    a.ret AS x, b.ret AS y
  FROM r a JOIN r b ON a.day = b.day AND a.event_type < b.event_type
), sh AS (
  SELECT k1, k2, x,
    y AS s_0,
    lag(y, 3) OVER w AS s_m3, lag(y, 1) OVER w AS s_m1,
    lead(y, 1) OVER w AS s_p1, lead(y, 3) OVER w AS s_p3
  FROM p WINDOW w AS (PARTITION BY k1, k2 ORDER BY t)
), g AS (
  SELECT k1, k2, CAST(count(*) AS BIGINT) AS n_periods,
    covar_samp(x, s_0) AS c_0,
    stddev_samp(CASE WHEN s_0 IS NOT NULL THEN x END) AS sx_0,
    stddev_samp(CASE WHEN x IS NOT NULL THEN s_0 END) AS sy_0,
    covar_samp(x, s_m3) AS c_m3,
    stddev_samp(CASE WHEN s_m3 IS NOT NULL THEN x END) AS sx_m3,
    stddev_samp(CASE WHEN x IS NOT NULL THEN s_m3 END) AS sy_m3,
    covar_samp(x, s_m1) AS c_m1,
    stddev_samp(CASE WHEN s_m1 IS NOT NULL THEN x END) AS sx_m1,
    stddev_samp(CASE WHEN x IS NOT NULL THEN s_m1 END) AS sy_m1,
    covar_samp(x, s_p1) AS c_p1,
    stddev_samp(CASE WHEN s_p1 IS NOT NULL THEN x END) AS sx_p1,
    stddev_samp(CASE WHEN x IS NOT NULL THEN s_p1 END) AS sy_p1,
    covar_samp(x, s_p3) AS c_p3,
    stddev_samp(CASE WHEN s_p3 IS NOT NULL THEN x END) AS sx_p3,
    stddev_samp(CASE WHEN x IS NOT NULL THEN s_p3 END) AS sy_p3
  FROM sh GROUP BY 1, 2
)
SELECT k1, k2, n_periods,
  CASE WHEN sx_0 IS NULL OR isnan(sx_0) OR sx_0 = 0
         OR sy_0 IS NULL OR isnan(sy_0) OR sy_0 = 0
         OR c_0 IS NULL OR isnan(c_0) THEN NULL
       ELSE floor(c_0 / (sx_0 * sy_0) * 1000000 + 0.5) / 1000000 + 0.0
  END AS ccf_0,
  CASE WHEN sx_m3 IS NULL OR isnan(sx_m3) OR sx_m3 = 0
         OR sy_m3 IS NULL OR isnan(sy_m3) OR sy_m3 = 0
         OR c_m3 IS NULL OR isnan(c_m3) THEN NULL
       ELSE floor(c_m3 / (sx_m3 * sy_m3) * 1000000 + 0.5) / 1000000 + 0.0
  END AS ccf_m3,
  CASE WHEN sx_m1 IS NULL OR isnan(sx_m1) OR sx_m1 = 0
         OR sy_m1 IS NULL OR isnan(sy_m1) OR sy_m1 = 0
         OR c_m1 IS NULL OR isnan(c_m1) THEN NULL
       ELSE floor(c_m1 / (sx_m1 * sy_m1) * 1000000 + 0.5) / 1000000 + 0.0
  END AS ccf_m1,
  CASE WHEN sx_p1 IS NULL OR isnan(sx_p1) OR sx_p1 = 0
         OR sy_p1 IS NULL OR isnan(sy_p1) OR sy_p1 = 0
         OR c_p1 IS NULL OR isnan(c_p1) THEN NULL
       ELSE floor(c_p1 / (sx_p1 * sy_p1) * 1000000 + 0.5) / 1000000 + 0.0
  END AS ccf_p1,
  CASE WHEN sx_p3 IS NULL OR isnan(sx_p3) OR sx_p3 = 0
         OR sy_p3 IS NULL OR isnan(sy_p3) OR sy_p3 = 0
         OR c_p3 IS NULL OR isnan(c_p3) THEN NULL
       ELSE floor(c_p3 / (sx_p3 * sy_p3) * 1000000 + 0.5) / 1000000 + 0.0
  END AS ccf_p3
FROM g""",

    // risk parity: vol rounds before inversion, 1/vol quantizes to
    // micro-unit BIGINTs (order-free normalizing sum -> identical
    // weight ratios); realized portfolio vol over complete days only,
    // engine-order aggregates -> sr6 at emission
    "q195_risk_parity" ->
      """WITH cd AS (
  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
    arg_max(value, event_id) AS cl
  FROM events GROUP BY 1, 2
), d AS (
  SELECT event_type, strftime(date_trunc('day', bucket_start), '%Y-%m-%d') AS day,
    arg_max(cl, bucket_start) AS close
  FROM cd GROUP BY 1, 2
), r AS (
  SELECT event_type, day, ret FROM (
    SELECT event_type, day,
      CASE WHEN lag(close) OVER (PARTITION BY event_type ORDER BY day) = 0 THEN NULL
           ELSE close / lag(close) OVER (PARTITION BY event_type ORDER BY day) - 1.0
      END AS ret
    FROM d
  ) WHERE ret IS NOT NULL
), v AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_rets, stddev_samp(ret) AS sd
  FROM r GROUP BY 1
), v2 AS (
  SELECT event_type, n_rets,
    CASE WHEN n_rets < 2 OR isnan(sd) OR sd <= 0 THEN NULL
         ELSE floor(sd * 1000000 + 0.5) / 1000000 + 0.0 END AS vol
  FROM v
), v3 AS (
  SELECT event_type, n_rets, vol,
    CASE WHEN vol IS NOT NULL
         THEN CAST(floor(1.0 / vol * 1000000 + 0.5) AS BIGINT) END AS im
  FROM v2
), wts AS (
  SELECT event_type, n_rets, vol,
    CASE WHEN im IS NOT NULL
         THEN CAST(im AS DOUBLE) / CAST(CAST(sum(im) OVER () AS BIGINT) AS DOUBLE)
    END AS weight
  FROM v3
), nb AS (
  SELECT CAST(count(*) AS BIGINT) AS nbook FROM wts WHERE weight IS NOT NULL
), pr AS (
  SELECT r.day, sum(w.weight * r.ret) AS pr, CAST(count(*) AS BIGINT) AS np
  FROM r JOIN wts w ON r.event_type = w.event_type AND w.weight IS NOT NULL
  GROUP BY 1
), pv AS (
  SELECT floor(stddev_samp(pr) * 1000000 + 0.5) / 1000000 + 0.0 AS port_vol
  FROM pr, nb WHERE np = nbook
)
SELECT w.event_type, w.n_rets, w.vol, w.weight, pv.port_vol
FROM wts w CROSS JOIN pv""",

    // risk-report capstone: q185's tear-sheet moments + q181's VaR/ES
    // (over daily-close 1-step moves) + full-sample beta to the
    // cross-sectional mean, all on ONE daily close frame
    "q199_risk_report" ->
      """WITH d AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, arg_max(value, ts) AS close
  FROM events GROUP BY 1, 2
), e AS (
  SELECT user_id, day, close,
    CASE WHEN lag(close) OVER (PARTITION BY user_id ORDER BY day) = 0 THEN NULL
         ELSE close / lag(close) OVER (PARTITION BY user_id ORDER BY day) - 1.0
    END AS ret,
    CASE WHEN max(close) OVER (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 0 THEN NULL
         ELSE close / max(close) OVER (PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1.0
    END AS dd,
    close - lag(close) OVER (PARTITION BY user_id ORDER BY day) AS mv
  FROM d
), tear AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_periods,
    CASE WHEN count(ret) < 2 THEN NULL
         ELSE floor(stddev_samp(ret) * sqrt(252.0) * 1000000 + 0.5) / 1000000 + 0.0
    END AS ann_vol,
    CASE WHEN count(ret) < 2 OR stddev_samp(ret) = 0 THEN NULL
         ELSE floor(avg(ret) * 252.0 / (stddev_samp(ret) * sqrt(252.0))
           * 1000000 + 0.5) / 1000000 + 0.0
    END AS sharpe,
    floor(min(dd) * 1000000 + 0.5) / 1000000 + 0.0 AS max_drawdown
  FROM e GROUP BY 1
), mvd AS (
  SELECT user_id, mv FROM e WHERE mv IS NOT NULL
), vq AS (
  SELECT user_id, quantile_cont(mv, 0.05) AS va FROM mvd GROUP BY 1
), varx AS (
  SELECT mvd.user_id,
    floor((max(va) + 0.0) * 1000000 + 0.5) / 1000000 AS var_5,
    floor((avg(CASE WHEN mv <= va THEN mv END) + 0.0) * 1000000 + 0.5) / 1000000
      AS es_5
  FROM mvd JOIN vq ON mvd.user_id = vq.user_id GROUP BY 1
), r AS (
  SELECT user_id, day, ret FROM e WHERE ret IS NOT NULL
), mkt AS (
  SELECT day, avg(ret) AS m FROM r GROUP BY 1
), beta AS (
  SELECT r.user_id,
    CASE WHEN var_samp(mkt.m) IS NULL OR var_samp(mkt.m) = 0 THEN NULL
         ELSE floor(covar_samp(r.ret, mkt.m) / var_samp(mkt.m)
           * 1000000 + 0.5) / 1000000 + 0.0 END AS beta
  FROM r JOIN mkt ON r.day = mkt.day GROUP BY 1
)
SELECT t.user_id, t.n_periods, t.ann_vol, t.sharpe, t.max_drawdown,
  v.var_5, v.es_5, b.beta
FROM tear t JOIN varx v ON t.user_id = v.user_id
JOIN beta b ON t.user_id = b.user_id""",

    // bootstrap Sharpe: non-overlapping 5-blocks of the market return
    // series, draws are md5("b:k")-uniform block picks (the q67
    // convention) — a pure function, so both engines draw the SAME
    // resamples; replicate moments -> engine-order -> sr6; percentile
    // is the exact interpolated contract. NB integer division is //
    // (DuckDB / on integers yields DOUBLE and CAST rounds, not
    // truncates)
    "q206_bootstrap_sharpe" ->
      """WITH d AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, arg_max(value, ts) AS close
  FROM events GROUP BY 1, 2
), r AS (
  SELECT user_id, day,
    CASE WHEN lag(close) OVER (PARTITION BY user_id ORDER BY day) = 0 THEN NULL
         ELSE close / lag(close) OVER (PARTITION BY user_id ORDER BY day) - 1.0
    END AS ret
  FROM d
), mkt AS (
  SELECT day, avg(ret) AS m FROM r WHERE ret IS NOT NULL GROUP BY 1
), idx AS (
  SELECT m, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i FROM mkt
), blk AS (
  SELECT (i - 1) // 5 AS b_id, m FROM idx
), nb AS (
  SELECT CAST(count(*) AS BIGINT) AS n_blocks
  FROM (SELECT b_id, count(*) AS c FROM blk GROUP BY 1) WHERE c = 5
), comp AS (
  SELECT blk.b_id, blk.m FROM blk, nb WHERE blk.b_id < nb.n_blocks
), pt AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days, avg(m) AS mm, stddev_samp(m) AS ms
  FROM comp
), draws AS (
  SELECT g1.b, g2.k,
    CAST(floor(
      (CAST(('0x' || substr(md5(CAST(g1.b AS VARCHAR) || ':' || CAST(g2.k AS VARCHAR)), 1, 15)) AS BIGINT)
        / 1152921504606846976.0)
      * CAST(nb.n_blocks AS DOUBLE)) AS BIGINT) AS b_id
  FROM nb, generate_series(1, 200) AS g1(b),
       generate_series(1, 1000) AS g2(k)
  WHERE g2.k <= nb.n_blocks
), reps AS (
  SELECT b,
    CASE WHEN count(*) < 2 OR stddev_samp(m) = 0 THEN NULL
         ELSE avg(m) / stddev_samp(m) END AS sh
  FROM draws JOIN comp ON draws.b_id = comp.b_id
  GROUP BY b
), ci AS (
  SELECT CAST(count(sh) AS BIGINT) AS b_resamples,
    floor(quantile_cont(sh, 0.025) * 1000000 + 0.5) / 1000000 + 0.0 AS ci_lo,
    floor(quantile_cont(sh, 0.975) * 1000000 + 0.5) / 1000000 + 0.0 AS ci_hi
  FROM reps
)
SELECT pt.n_days, nb.n_blocks,
  CASE WHEN pt.n_days < 2 OR pt.ms = 0 THEN NULL
       ELSE floor(pt.mm / pt.ms * 1000000 + 0.5) / 1000000 + 0.0 END AS sharpe,
  ci.b_resamples, ci.ci_lo, ci.ci_hi
FROM pt, nb, ci""",

    // net backtest: q188's spread minus 10 bps x (churn of both legs,
    // q194's construction; first book pays full cost); the net
    // re-quantizes to BIGINT micro-units before the cumulative sum
    "q205_net_backtest" ->
      """WITH d AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, arg_max(value, ts) AS close
  FROM events GROUP BY 1, 2
), r AS (
  SELECT user_id, day,
    CASE WHEN lag(close) OVER (PARTITION BY user_id ORDER BY day) = 0 THEN NULL
         ELSE close / lag(close) OVER (PARTITION BY user_id ORDER BY day) - 1.0
    END AS ret,
    CASE WHEN lag(close, 5) OVER (PARTITION BY user_id ORDER BY day) = 0 THEN NULL
         ELSE close / lag(close, 5) OVER (PARTITION BY user_id ORDER BY day) - 1.0
    END AS mom
  FROM d
), s AS (
  SELECT user_id, day, ret,
    lag(mom) OVER (PARTITION BY user_id ORDER BY day) AS sig
  FROM r
), b AS (
  SELECT user_id, day, ret,
    ntile(5) OVER (PARTITION BY day ORDER BY sig DESC, user_id) AS bkt
  FROM s WHERE sig IS NOT NULL AND ret IS NOT NULL
), p AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_universe,
    avg(CASE WHEN bkt = 1 THEN ret END) AS lr,
    avg(CASE WHEN bkt = 5 THEN ret END) AS sr
  FROM b GROUP BY day
), q AS (
  SELECT day, n_universe,
    CASE WHEN lr IS NOT NULL AND sr IS NOT NULL
         THEN CAST(floor((lr - sr) * 1000000 + 0.5) AS BIGINT) END AS ls_micro
  FROM p
), mem1 AS (SELECT user_id, day FROM b WHERE bkt = 1),
days1 AS (
  SELECT day, CAST(dense_rank() OVER (ORDER BY day) AS BIGINT) AS idx
  FROM (SELECT DISTINCT day FROM mem1)
), m1 AS (
  SELECT mem1.user_id, mem1.day, days1.idx FROM mem1 JOIN days1 ON mem1.day = days1.day
), t1 AS (
  SELECT day,
    CASE WHEN max(idx) = 1 THEN NULL
         ELSE 1.0 - CAST(sum(CASE WHEN held THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) END AS churn_top
  FROM (SELECT m.day, m.idx, p.user_id IS NOT NULL AS held
        FROM m1 m LEFT JOIN m1 p ON p.user_id = m.user_id AND p.idx = m.idx - 1)
  GROUP BY day
), mem5 AS (SELECT user_id, day FROM b WHERE bkt = 5),
days5 AS (
  SELECT day, CAST(dense_rank() OVER (ORDER BY day) AS BIGINT) AS idx
  FROM (SELECT DISTINCT day FROM mem5)
), m5 AS (
  SELECT mem5.user_id, mem5.day, days5.idx FROM mem5 JOIN days5 ON mem5.day = days5.day
), t5 AS (
  SELECT day,
    CASE WHEN max(idx) = 1 THEN NULL
         ELSE 1.0 - CAST(sum(CASE WHEN held THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) END AS churn_bot
  FROM (SELECT m.day, m.idx, p.user_id IS NOT NULL AS held
        FROM m5 m LEFT JOIN m5 p ON p.user_id = m.user_id AND p.idx = m.idx - 1)
  GROUP BY day
), j AS (
  SELECT q.day, q.n_universe,
    CAST(q.ls_micro AS DOUBLE) / CAST(1000000 AS DOUBLE) AS ls_ret,
    t1.churn_top, t5.churn_bot,
    CASE WHEN q.ls_micro IS NOT NULL
         THEN CAST(floor((CAST(q.ls_micro AS DOUBLE) / CAST(1000000 AS DOUBLE)
             - 0.001 * (coalesce(t1.churn_top, 1.0) + coalesce(t5.churn_bot, 1.0)))
           * 1000000 + 0.5) AS BIGINT) END AS net_micro
  FROM q LEFT JOIN t1 ON q.day = t1.day LEFT JOIN t5 ON q.day = t5.day
)
SELECT day, n_universe, ls_ret, churn_top, churn_bot,
  CAST(net_micro AS DOUBLE) / CAST(1000000 AS DOUBLE) AS net_ls,
  CAST(CAST(sum(net_micro) OVER (ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)
    / CAST(1000000 AS DOUBLE) AS cum_net
FROM j""",

    // rank IC: per (horizon, day) Spearman via exact integer rank sums
    // — one BIGINT division, no rounding; the cross-day mean/t window
    // accumulates in engine order -> sr6
    "q204_rank_ic" ->
      """WITH d AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, arg_max(value, ts) AS close
  FROM events GROUP BY 1, 2
), b AS (
  SELECT user_id, day, close,
    CASE WHEN lag(close, 5) OVER w = 0 THEN NULL
         ELSE close / lag(close, 5) OVER w - 1.0 END AS sig,
    CASE WHEN close = 0 THEN NULL
         ELSE lead(close, 1) OVER w / close - 1.0 END AS f1,
    CASE WHEN close = 0 THEN NULL
         ELSE lead(close, 3) OVER w / close - 1.0 END AS f3,
    CASE WHEN close = 0 THEN NULL
         ELSE lead(close, 5) OVER w / close - 1.0 END AS f5
  FROM d WINDOW w AS (PARTITION BY user_id ORDER BY day)
), r1 AS (
  SELECT 1 AS horizon, day,
    CAST(row_number() OVER (PARTITION BY day ORDER BY sig, user_id) AS BIGINT) AS ra,
    CAST(row_number() OVER (PARTITION BY day ORDER BY f1, user_id) AS BIGINT) AS rb
  FROM b WHERE sig IS NOT NULL AND f1 IS NOT NULL
), r3 AS (
  SELECT 3 AS horizon, day,
    CAST(row_number() OVER (PARTITION BY day ORDER BY sig, user_id) AS BIGINT) AS ra,
    CAST(row_number() OVER (PARTITION BY day ORDER BY f3, user_id) AS BIGINT) AS rb
  FROM b WHERE sig IS NOT NULL AND f3 IS NOT NULL
), r5 AS (
  SELECT 5 AS horizon, day,
    CAST(row_number() OVER (PARTITION BY day ORDER BY sig, user_id) AS BIGINT) AS ra,
    CAST(row_number() OVER (PARTITION BY day ORDER BY f5, user_id) AS BIGINT) AS rb
  FROM b WHERE sig IS NOT NULL AND f5 IS NOT NULL
), u AS (
  SELECT * FROM r1 UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r5
), g AS (
  SELECT horizon, day, CAST(count(*) AS BIGINT) AS n_universe,
    CAST(sum(ra * rb) AS BIGINT) AS s12,
    CAST(sum(ra) AS BIGINT) AS s1,
    CAST(sum(ra * ra) AS BIGINT) AS sq
  FROM u GROUP BY 1, 2
), ic AS (
  SELECT horizon, day, n_universe,
    CASE WHEN n_universe < 2 THEN NULL
         ELSE CAST(n_universe * s12 - s1 * s1 AS DOUBLE)
            / CAST(n_universe * sq - s1 * s1 AS DOUBLE) END AS ic
  FROM g
)
SELECT horizon, day, n_universe, ic,
  floor(avg(ic) OVER (PARTITION BY horizon) * 1000000 + 0.5) / 1000000 + 0.0
    AS mean_ic,
  CASE WHEN count(ic) OVER (PARTITION BY horizon) < 2
         OR stddev_samp(ic) OVER (PARTITION BY horizon) = 0 THEN NULL
       ELSE floor(avg(ic) OVER (PARTITION BY horizon)
           / (stddev_samp(ic) OVER (PARTITION BY horizon)
             / sqrt(CAST(count(ic) OVER (PARTITION BY horizon) AS DOUBLE)))
         * 1000000 + 0.5) / 1000000 + 0.0
  END AS t_ic
FROM ic""",

    // leg turnover: q188's CTE chain through the bucket frame, top-leg
    // membership, dense-ranked day index, consecutive-book self-join;
    // all counts exact integers, one deterministic division
    "q194_leg_turnover" ->
      """WITH d AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, arg_max(value, ts) AS close
  FROM events GROUP BY 1, 2
), r AS (
  SELECT user_id, day,
    CASE WHEN lag(close) OVER (PARTITION BY user_id ORDER BY day) = 0 THEN NULL
         ELSE close / lag(close) OVER (PARTITION BY user_id ORDER BY day) - 1.0
    END AS ret,
    CASE WHEN lag(close, 5) OVER (PARTITION BY user_id ORDER BY day) = 0 THEN NULL
         ELSE close / lag(close, 5) OVER (PARTITION BY user_id ORDER BY day) - 1.0
    END AS mom
  FROM d
), s AS (
  SELECT user_id, day, ret,
    lag(mom) OVER (PARTITION BY user_id ORDER BY day) AS sig
  FROM r
), b AS (
  SELECT user_id, day,
    ntile(5) OVER (PARTITION BY day ORDER BY sig DESC, user_id) AS bkt
  FROM s WHERE sig IS NOT NULL AND ret IS NOT NULL
), mem AS (
  SELECT user_id, day FROM b WHERE bkt = 1
), days AS (
  SELECT day, CAST(dense_rank() OVER (ORDER BY day) AS BIGINT) AS idx
  FROM (SELECT DISTINCT day FROM mem)
), m AS (
  SELECT mem.user_id, mem.day, days.idx FROM mem JOIN days ON mem.day = days.day
), j AS (
  SELECT m.day, m.idx,
    CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END AS held
  FROM m LEFT JOIN m p ON p.user_id = m.user_id AND p.idx = m.idx - 1
)
SELECT day, CAST(count(*) AS BIGINT) AS n_long,
  CAST(sum(held) AS BIGINT) AS n_stay,
  CASE WHEN idx = 1 THEN NULL
       ELSE 1.0 - CAST(sum(held) AS DOUBLE) / CAST(count(*) AS DOUBLE)
  END AS churn
FROM j GROUP BY day, idx""",

    // incremental moments: the engine merges base-snapshot state with a
    // CDC-increment read and must reproduce the full recompute; the
    // oracle IS the full recompute, in the engine's merge formula
    // (n, s1, s2 sums -> mean, textbook vol) so only sum order differs
    "q193_incremental_moments" ->
      """WITH m AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS s1,
    CAST(sum(CAST(floor(value * value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS s2
  FROM events GROUP BY 1
)
SELECT user_id, n,
  floor(CAST(s1 AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE)
    * 1000000 + 0.5) / 1000000 + 0.0 AS mean,
  CASE WHEN n < 2 THEN NULL
       ELSE floor(sqrt(
           (CAST(s2 AS DOUBLE) / 1000000.0
             - (CAST(s1 AS DOUBLE) / 1000000.0) * (CAST(s1 AS DOUBLE) / 1000000.0)
               / CAST(n AS DOUBLE))
             / (CAST(n AS DOUBLE) - 1.0))
         * 1000000 + 0.5) / 1000000 + 0.0
  END AS vol
FROM m""",

    // stream-txn exactly-once: the engine ingests orders as two batches
    // with batch 0 REPLAYED; the txn id drops the duplicate, so the
    // aggregate equals plain orders (a double-add would double the
    // even-year rows)
    // tx history: three deterministic single-file appends -> the log
    // relation is fully pinned (versions, file counts, txn ids), and
    // each version's row count is data-derived from orders
    "q196_tx_history_sql" ->
      """WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
ev AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders WHERE year(o_orderdate) % 2 = 0),
hi AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders WHERE o_totalprice >= 300000)
SELECT CAST(0 AS BIGINT) AS version, CAST(1 AS BIGINT) AS n_added,
  CAST(0 AS BIGINT) AS n_removed, false AS is_compact,
  'q196-ingest' AS txn_app, CAST(0 AS BIGINT) AS txn_ver, ev.n AS n_rows
FROM ev
UNION ALL
SELECT CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), false,
  'q196-ingest', CAST(1 AS BIGINT), a.n FROM a
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), false,
  'q196-ingest', CAST(2 AS BIGINT), a.n + hi.n FROM a, hi""",

    "q189_stream_txn" ->
      """SELECT year(o_orderdate) AS order_year, CAST(count(*) AS BIGINT) AS n,
  round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY 1""",

    "q183_tx_range_sql" ->
      """SELECT year(o_orderdate) AS order_year, CAST(count(*) AS BIGINT) AS n,
  round(sum(o_totalprice), 2) AS total, true AS pruned_ok
FROM orders WHERE o_totalprice BETWEEN 100000 AND 150000
GROUP BY 1""",

    // historical VaR/ES: quantile_cont == percentile over exact 1-step
    // diffs; tail membership compares identical doubles, only the means
    // round
    "q181_historical_var" ->
      """WITH d AS (
  SELECT user_id, value - lag(value) OVER w AS r
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), dd AS (
  SELECT user_id, r FROM d WHERE r IS NOT NULL
), v AS (
  SELECT user_id, quantile_cont(r, 0.05) AS va FROM dd GROUP BY 1
)
SELECT dd.user_id, CAST(count(*) AS BIGINT) AS n,
  floor((max(va) + 0.0) * 1000000 + 0.5) / 1000000 AS var_a,
  CAST(count(CASE WHEN r <= va THEN 1 END) AS BIGINT) AS n_tail,
  floor((avg(CASE WHEN r <= va THEN r END) + 0.0) * 1000000 + 0.5) / 1000000
    AS es_a
FROM dd JOIN v ON dd.user_id = v.user_id
GROUP BY 1""",

    // rolling beta: raw window sums (a windowed covar would divide on
    // the 1-row head frame), guarded projection division, pairwise-null
    // drop in every sum
    "q182_rolling_beta" ->
      """WITH cd AS (
  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
    arg_max(value, event_id) AS cl
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, bucket_start,
    CASE WHEN lag(cl) OVER w = 0 THEN NULL
         ELSE cl / lag(cl) OVER w - 1.0 END AS ret
  FROM cd
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_start)
), m AS (
  SELECT bucket_start, avg(ret) AS mkt FROM r GROUP BY 1
), j AS (
  SELECT r.event_type, r.bucket_start, r.ret, m.mkt
  FROM r JOIN m ON r.bucket_start = m.bucket_start
), wnd AS (
  SELECT event_type, bucket_start,
    CAST(count(CASE WHEN ret IS NOT NULL AND mkt IS NOT NULL THEN 1 END)
      OVER f AS DOUBLE) AS n,
    sum(CASE WHEN ret IS NOT NULL AND mkt IS NOT NULL THEN ret END) OVER f AS sx,
    sum(CASE WHEN ret IS NOT NULL AND mkt IS NOT NULL THEN mkt END) OVER f AS sy,
    sum(CASE WHEN ret IS NOT NULL AND mkt IS NOT NULL THEN ret * mkt END)
      OVER f AS sxy,
    sum(CASE WHEN ret IS NOT NULL AND mkt IS NOT NULL THEN mkt * mkt END)
      OVER f AS syy
  FROM j
  WINDOW f AS (PARTITION BY event_type ORDER BY bucket_start
    ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
)
SELECT event_type, bucket_start,
  CASE WHEN n < 2 OR (n * syy - sy * sy) <= 0 THEN NULL
       ELSE floor(((n * sxy - sx * sy) / (n * syy - sy * sy) + 0.0)
         * 1000000 + 0.5) / 1000000 END AS beta50
FROM wnd""",

    // order-flow persistence: q160's sign gap-fill CTE feeding q167's
    // ACF shape — corr over the integer sign series and its lags
    "q179_flow_persistence" ->
      """WITH s AS (
  SELECT event_type, ts, event_id, value - lag(value) OVER w AS d
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), sg AS (
  SELECT event_type, ts, event_id,
    COALESCE(last_value(CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 END IGNORE NULLS)
      OVER (PARTITION BY event_type ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS sgn
  FROM s
), l AS (
  SELECT event_type, sgn,
    lag(sgn, 1) OVER w2 AS l1, lag(sgn, 2) OVER w2 AS l2,
    lag(sgn, 5) OVER w2 AS l5, lag(sgn, 10) OVER w2 AS l10
  FROM sg
  WINDOW w2 AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_type, CAST(count(sgn) AS BIGINT) AS n,
  floor(corr(sgn, l1) * 1000000 + 0.5) / 1000000 AS acf_1,
  floor(corr(sgn, l2) * 1000000 + 0.5) / 1000000 AS acf_2,
  floor(corr(sgn, l5) * 1000000 + 0.5) / 1000000 AS acf_5,
  floor(corr(sgn, l10) * 1000000 + 0.5) / 1000000 AS acf_10
FROM l GROUP BY 1""",

    // event study: micro-sum day frame, cross-sectional mean broadcast
    // back, row-relative CAR window, anchored means (null skip = the
    // SQL convention in both engines at every stage)
    "q180_event_study_car" ->
      """WITH daily AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
    CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000
      AS uval,
    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS anchor
  FROM events GROUP BY 1, 2
), r AS (
  SELECT *, uval - lag(uval) OVER (PARTITION BY user_id ORDER BY day) AS rr
  FROM daily
), mkt AS (
  SELECT day, avg(rr) AS m FROM r GROUP BY 1
), a AS (
  SELECT r.user_id, r.day, r.anchor, r.rr - mkt.m AS ar
  FROM r JOIN mkt ON r.day = mkt.day
), c AS (
  SELECT user_id, day, anchor, ar,
    sum(ar) OVER (PARTITION BY user_id ORDER BY day
      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS car
  FROM a
)
SELECT user_id,
  CAST(count(CASE WHEN anchor = 1 THEN 1 END) AS BIGINT) AS n_events,
  floor((avg(CASE WHEN anchor = 1 THEN car END) + 0.0) * 1000000 + 0.5) / 1000000
    AS mean_car,
  floor((avg(CASE WHEN anchor = 1 THEN ar END) + 0.0) * 1000000 + 0.5) / 1000000
    AS mean_ar0
FROM c GROUP BY 1""",

    // Corwin-Schultz: day ranges -> 2-day beta/gamma -> alpha -> spread;
    // K = 3 - 2*sqrt(2) string-cast, every op mirrored in order; first
    // day of a key nulls through beta
    "q176_corwin_schultz" -> {
      val k = s"CAST('${graft.analytics.Microstructure.CorwinSchultzK}' AS DOUBLE)"
      s"""WITH p AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
    max(value) AS high, min(value) AS low, CAST(count(*) AS BIGINT) AS n_ticks
  FROM events WHERE value > 0 GROUP BY 1, 2
), l AS (
  SELECT *, lag(high) OVER w AS hp, lag(low) OVER w AS lp
  FROM p WINDOW w AS (PARTITION BY event_type ORDER BY day)
), c AS (
  SELECT event_type, day, high, low, n_ticks,
    ln(high / low) * ln(high / low) + ln(hp / lp) * ln(hp / lp) AS beta,
    ln(greatest(high, hp) / least(low, lp))
      * ln(greatest(high, hp) / least(low, lp)) AS gamma
  FROM l
), al AS (
  SELECT event_type, day, high, low, n_ticks,
    (sqrt(2.0 * beta) - sqrt(beta)) / $k - sqrt(gamma / $k) AS alpha
  FROM c
), sp AS (
  SELECT event_type, day, high, low, n_ticks,
    2.0 * (exp(alpha) - 1.0) / (exp(alpha) + 1.0) AS sv
  FROM al
)
SELECT event_type, day, high, low, n_ticks,
  floor((sv + 0.0) * 1000000 + 0.5) / 1000000 AS spread_raw,
  CASE WHEN sv IS NULL THEN NULL
       ELSE floor(greatest(sv, 0.0) * 1000000 + 0.5) / 1000000 END AS spread
FROM sp"""
    },

    // Hurst from the VR scaling law: four VRs, log-log closed-form
    // slope with every x-side constant driver-computed and string-cast;
    // association order parenthesized to mirror the Column expression
    "q177_hurst" -> {
      import graft.analytics.Indicators.{HurstX, HurstSumX, HurstDenom}
      def xc(i: Int) = s"CAST('${HurstX(i)}' AS DOUBLE)"
      val sy = "(((ln(vr2) + ln(vr4)) + ln(vr8)) + ln(vr16))"
      val sxy = s"(((${xc(0)} * ln(vr2) + ${xc(1)} * ln(vr4)) + ${xc(2)} * ln(vr8)) + ${xc(3)} * ln(vr16))"
      s"""WITH s AS (
  SELECT user_id, value,
    value - lag(value, 1) OVER w AS d1,
    value - lag(value, 2) OVER w AS d2,
    value - lag(value, 4) OVER w AS d4,
    value - lag(value, 8) OVER w AS d8,
    value - lag(value, 16) OVER w AS d16
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), g AS (
  SELECT user_id, CAST(count(d16) AS BIGINT) AS n_q,
    var_samp(d1) AS v1, var_samp(d2) AS v2, var_samp(d4) AS v4,
    var_samp(d8) AS v8, var_samp(d16) AS v16
  FROM s GROUP BY 1
), vr AS (
  SELECT user_id, n_q,
    CASE WHEN v1 IS NULL OR v1 = 0 OR v2 IS NULL THEN NULL
         ELSE v2 / (2.0 * v1) END AS vr2,
    CASE WHEN v1 IS NULL OR v1 = 0 OR v4 IS NULL THEN NULL
         ELSE v4 / (4.0 * v1) END AS vr4,
    CASE WHEN v1 IS NULL OR v1 = 0 OR v8 IS NULL THEN NULL
         ELSE v8 / (8.0 * v1) END AS vr8,
    CASE WHEN v1 IS NULL OR v1 = 0 OR v16 IS NULL THEN NULL
         ELSE v16 / (16.0 * v1) END AS vr16
  FROM g
)
SELECT user_id, n_q,
  floor(vr2 * 1000000 + 0.5) / 1000000 AS vr_2,
  floor(vr4 * 1000000 + 0.5) / 1000000 AS vr_4,
  floor(vr8 * 1000000 + 0.5) / 1000000 AS vr_8,
  floor(vr16 * 1000000 + 0.5) / 1000000 AS vr_16,
  CASE WHEN vr2 IS NULL OR vr2 <= 0 OR vr4 IS NULL OR vr4 <= 0
         OR vr8 IS NULL OR vr8 <= 0 OR vr16 IS NULL OR vr16 <= 0 THEN NULL
       ELSE floor(((1.0 + (4.0 * $sxy
           - CAST('$HurstSumX' AS DOUBLE) * $sy)
           / CAST('$HurstDenom' AS DOUBLE)) / 2.0)
         * 1000000 + 0.5) / 1000000 END AS hurst
FROM vr"""
    },

    // centroid silhouette: per-dimension means floored BEFORE distance
    // math, list_sum folds left-to-right (the q24/q82 contract), so
    // a/b are bit-identical and b < a is exact
    "q178_class_separation" ->
      """WITH ex AS (
  SELECT label, generate_subscripts(embedding, 1) AS pos,
    CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
), cent AS (
  SELECT label, pos, floor(avg(v) * 1000000 + 0.5) / 1000000 AS c
  FROM ex GROUP BY 1, 2
), cl AS (
  SELECT label AS lab, list(c ORDER BY pos) AS cv FROM cent GROUP BY 1
), d AS (
  SELECT e.vec_id, e.label, c.lab,
    sqrt(list_sum(list_transform(range(len(c.cv)),
      i -> (CAST(e.embedding[i + 1] AS DOUBLE) - c.cv[i + 1])
         * (CAST(e.embedding[i + 1] AS DOUBLE) - c.cv[i + 1])))) AS dist
  FROM embeddings e CROSS JOIN cl c
), ab AS (
  SELECT vec_id, label,
    min(CASE WHEN lab = label THEN dist END) AS a,
    min(CASE WHEN lab <> label THEN dist END) AS b
  FROM d GROUP BY 1, 2
)
SELECT label, CAST(count(*) AS BIGINT) AS n,
  floor((avg(CASE WHEN greatest(a, b) = 0 THEN 0.0
                  ELSE (b - a) / greatest(a, b) END) + 0.0)
    * 1000000 + 0.5) / 1000000 AS silhouette,
  CAST(sum(CASE WHEN b < a THEN 1 ELSE 0 END) AS BIGINT) AS n_misassigned
FROM ab GROUP BY 1""",

    // finance research capstone: q151's median -> q149's fracdiff ->
    // q147/q152's labels + uniqueness ON the denoised series -> q143's
    // fold/embargo slice rule per row -> per-(fold, label) summary.
    // Every fragment is copied verbatim from its individually-verified
    // twin with only the label input switched to med21
    "q175_research_capstone" -> q175CapstoneSql,

    // cluster-by compaction: the band aggregate is plain SQL; the three
    // layout booleans are structural (unsorted appends span the full
    // range -> no pruning; range-clustered rewrite -> strict-subset
    // scan; rewrite preserves content)
    "q174_cluster_compact" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
  round(sum(o_totalprice), 2) AS total,
  true AS before_full_scan, true AS after_pruned, true AS content_stable
FROM orders WHERE o_totalprice BETWEEN 50000 AND 80000""",

    // KS two-sample: ECDFs at distinct values (full tied mass jumps
    // before comparison), exact integer running counts, one division per
    // ECDF read -> bit-identical D; c(0.05) ships string-cast and the
    // drifted verdict compares the RAW doubles in both engines
    "q172_ks_drift" ->
      s"""WITH b AS (
  SELECT min(epoch_us(ts)) AS tmn, max(epoch_us(ts)) AS tmx FROM events
), s AS (
  SELECT event_type, value,
    COALESCE(epoch_us(ts) * 2 >= tmn + tmx, FALSE) AS cur
  FROM events, b WHERE value IS NOT NULL
), c AS (
  SELECT event_type, value AS v,
    CAST(sum(CASE WHEN cur THEN 0 ELSE 1 END) AS BIGINT) AS rc,
    CAST(sum(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT) AS cc
  FROM s GROUP BY 1, 2
), r AS (
  SELECT event_type,
    sum(rc) OVER (PARTITION BY event_type ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rrun,
    sum(cc) OVER (PARTITION BY event_type ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS crun,
    sum(rc) OVER (PARTITION BY event_type) AS rn,
    sum(cc) OVER (PARTITION BY event_type) AS cn
  FROM c
), g AS (
  SELECT event_type, CAST(max(rn) AS BIGINT) AS n_ref,
    CAST(max(cn) AS BIGINT) AS n_cur,
    max(abs(CAST(rrun AS DOUBLE) / CAST(rn AS DOUBLE)
      - CAST(crun AS DOUBLE) / CAST(cn AS DOUBLE))) AS d
  FROM r WHERE rn > 0 AND cn > 0 GROUP BY 1
)
SELECT event_type, n_ref, n_cur,
  floor(d * 1000000 + 0.5) / 1000000 AS ks_d,
  floor((CAST('${graft.analytics.Drift.ksCriticalC(0.05)}' AS DOUBLE)
      * sqrt((CAST(n_ref AS DOUBLE) + CAST(n_cur AS DOUBLE))
        / (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE))))
    * 1000000 + 0.5) / 1000000 AS crit,
  d > CAST('${graft.analytics.Drift.ksCriticalC(0.05)}' AS DOUBLE)
      * sqrt((CAST(n_ref AS DOUBLE) + CAST(n_cur AS DOUBLE))
        / (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE))) AS drifted
FROM g""",

    // per-source cap: q131's quality CTEs feed a (source)-partitioned
    // rank over the (quality desc, id) total order; floored quality_p is
    // already bit-identical cross-engine so the cut is exact
    "q173_source_cap" ->
      s"""WITH $qualityPCtes, r AS (
  SELECT d.doc_id, d.source, d.text, p.quality_p,
    row_number() OVER (PARTITION BY d.source
      ORDER BY p.quality_p DESC, d.doc_id) AS rk
  FROM documents d JOIN p ON d.doc_id = p.doc_id
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN rk <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(sum(CASE WHEN rk <= 50
    THEN len(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0))
    END) AS BIGINT) AS kept_tokens
FROM r GROUP BY 1""",

    // variance ratio VR(5): overlapping diff variances, sample form; the
    // z constant 3q/(2(2q-1)(q-1)) rides as the literal 15/72 with the
    // multiplication order mirrored from the Column expression
    "q168_variance_ratio" ->
      """WITH s AS (
  SELECT user_id, value,
    value - lag(value, 1) OVER w AS d1,
    value - lag(value, 5) OVER w AS dq
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), g AS (
  SELECT user_id, CAST(count(dq) AS BIGINT) AS n_q,
    var_samp(d1) AS v1, var_samp(dq) AS vq
  FROM s GROUP BY 1
)
SELECT user_id, n_q,
  CASE WHEN v1 IS NULL OR v1 = 0 OR vq IS NULL THEN NULL
       ELSE floor((vq / (5.0 * v1)) * 1000000 + 0.5) / 1000000 END AS vr,
  CASE WHEN v1 IS NULL OR v1 = 0 OR vq IS NULL THEN NULL
       ELSE floor(((vq / (5.0 * v1)) - 1.0) * sqrt(15.0 * n_q / 72.0)
         * 1000000 + 0.5) / 1000000 END AS z_stat
FROM g""",

    // MAD outlier profile: exact interpolated medians (quantile_cont ==
    // percentile, the q33/q58 contract), one pinned association order
    // for the modified z, string-cast 0.6745, MAD=0 -> NULL disposition
    "q165_mad_outliers" ->
      """WITH m AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1
), d AS (
  SELECT e.event_type, e.value, m.med FROM events e JOIN m USING (event_type)
), md AS (
  SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad FROM d GROUP BY 1
)
SELECT d.event_type,
  floor(max(d.med) * 1000000 + 0.5) / 1000000 AS med,
  floor(max(md.mad) * 1000000 + 0.5) / 1000000 AS mad,
  CAST(count(*) AS BIGINT) AS n,
  CASE WHEN max(md.mad) = 0 THEN NULL
       ELSE CAST(sum(CASE WHEN abs(CAST('0.6745' AS DOUBLE) * (d.value - d.med) / md.mad) > 3.5
                          THEN 1 ELSE 0 END) AS BIGINT) END AS n_outliers
FROM d JOIN md ON d.event_type = md.event_type
GROUP BY d.event_type""",

    // zone-map range read: the 1995-1996 slice predicted straight from
    // orders; pruned_ok is the engine-side claim (scanned files < live
    // files) the oracle predicts true, q28's verdict pattern
    "q164_zone_map_read" ->
      """SELECT year(o_orderdate) AS order_year, count(*) AS n,
  round(sum(o_totalprice), 2) AS total, true AS pruned_ok
FROM orders WHERE year(o_orderdate) BETWEEN 1995 AND 1996
GROUP BY 1""",

    // incremental curation: the CDC increment is the odd-doc_id half by
    // construction; quality-gate it (q131 CTEs), drop docs whose text
    // digest already exists in the even-half history (q109's exact
    // semantics — the bloom is a pre-filter, not a semantic), report
    "q163_incremental_curation" ->
      s"""WITH $qualityPCtes, hist AS (
  SELECT DISTINCT sha256(text) AS ch FROM documents WHERE doc_id % 2 = 0
), inc AS (
  SELECT d.doc_id, d.source, d.text
  FROM documents d JOIN p ON d.doc_id = p.doc_id
  WHERE d.doc_id % 2 = 1 AND p.quality_p >= 0.5e0
)
SELECT i.source, count(*) AS n_docs,
  CAST(sum(len(list_filter(regexp_split_to_array(i.text, '\\s+'), x -> len(x) > 0))) AS BIGINT)
    AS n_tokens
FROM inc i LEFT JOIN hist h ON sha256(i.text) = h.ch
WHERE h.ch IS NULL
GROUP BY i.source""",

    // PCA whitening: verdict row (q28/q41 approximate-operator pattern)
    // — eigenvector sign/rotation freedom makes values unpinnable, but
    // whitened-cov==I, zero means, and descending positive eigenvalues
    // hold for ANY correct implementation; the oracle predicts true
    "q162_pca_whitening" ->
      """SELECT CAST(count(*) AS BIGINT) AS n, 16 AS k,
  true AS mean_zero_ok, true AS whitened_cov_ok, true AS ev_monotone_ok
FROM embeddings""",

    // VPIN: tick-rule sign with non-zero-change carry (last_value IGNORE
    // NULLS — a gap-fill, not a recurrence), 50-tick buckets, per-bucket
    // |net|/n and the rolling ratio-of-integer-sums form
    "q160_vpin" ->
      """WITH s AS (
  SELECT event_type, value - lag(value) OVER w AS d,
    CAST(row_number() OVER w AS BIGINT) AS rn
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), sg AS (
  SELECT event_type, rn,
    COALESCE(last_value(CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 END IGNORE NULLS)
      OVER (PARTITION BY event_type ORDER BY rn
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS sgn
  FROM s
), b AS (
  SELECT event_type, CAST((rn - 1) // 50 AS BIGINT) AS bucket,
    count(*) AS n_ticks, CAST(sum(sgn) AS BIGINT) AS net
  FROM sg GROUP BY 1, 2
)
SELECT event_type, bucket, n_ticks, net,
  floor((CAST(abs(net) AS DOUBLE) / CAST(n_ticks AS DOUBLE)) * 1000000 + 0.5) / 1000000
    AS vpin,
  floor((CAST(sum(abs(net)) OVER bw AS DOUBLE) / CAST(sum(n_ticks) OVER bw AS DOUBLE))
    * 1000000 + 0.5) / 1000000 AS vpin_roll
FROM b
WINDOW bw AS (PARTITION BY event_type ORDER BY bucket
  ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)""",

    // Kyle lambda + Roll spread: within-(series, day) windows feed one
    // hash aggregate; denominators guarded in the projection (the ANSI
    // trap note); pair-null covar semantics are the SQL standard in
    // both engines
    "q161_kyle_roll" ->
      """WITH s AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, ts, event_id, value,
    value - lag(value) OVER w AS d
  FROM events
  WINDOW w AS (PARTITION BY event_type, strftime(ts, '%Y-%m-%d') ORDER BY ts, event_id)
), s2 AS (
  SELECT event_type, day, d, lag(d) OVER w2 AS dprev,
    COALESCE(last_value(CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 END IGNORE NULLS)
      OVER (PARTITION BY event_type, day ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) * value AS sv
  FROM s
  WINDOW w2 AS (PARTITION BY event_type, day ORDER BY ts, event_id)
), g AS (
  SELECT event_type, day, CAST(count(d) AS BIGINT) AS n_changes,
    covar_samp(d, sv) AS cds, var_samp(sv) AS vs, covar_samp(d, dprev) AS c1
  FROM s2 GROUP BY 1, 2
)
SELECT event_type, day, n_changes,
  CASE WHEN vs IS NULL OR vs = 0 THEN NULL
       ELSE floor((cds / vs) * 1000000 + 0.5) / 1000000 END AS kyle_lambda,
  CASE WHEN c1 < 0 THEN floor((2 * sqrt(-c1)) * 1000000 + 0.5) / 1000000
       ELSE NULL END AS roll_spread
FROM g""",

    // Tx CDC read: the change sets are predictable straight from orders
    // — v0 holds the pre-1997 slice, v1 upserts year>=1996 at doubled
    // price, so 1996 rows are updates (value moved), post-1996 rows are
    // inserts, and nothing deletes; images are post-change
    "q159_tx_changes" ->
      """SELECT * FROM (
  SELECT 'update' AS change_type, year(o_orderdate) AS order_year,
    count(*) AS n, round(sum(o_totalprice * 2), 2) AS total
  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 2
  UNION ALL
  SELECT 'insert' AS change_type, year(o_orderdate) AS order_year,
    count(*) AS n, round(sum(o_totalprice * 2), 2) AS total
  FROM orders WHERE year(o_orderdate) > 1996 GROUP BY 2
)""",

    // tick-imbalance bar closes: the q154 recursive-CTE pattern with an
    // INTEGER state vector — tick-rule sign (previous sign carried on a
    // zero change) accumulates into theta, |theta| >= 4 fires and
    // resets both theta and the bar tick count; the only float op is
    // the price comparison, so no rounding anywhere
    "q158_imbalance_bars" ->
      """WITH RECURSIVE s AS (
  SELECT user_id, ts, CAST(CAST(value AS REAL) AS DOUBLE) AS p,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS rn
  FROM events
), rec AS (
  SELECT user_id, rn, ts, p, p AS ref, 0 AS sgn,
    CAST(0 AS BIGINT) AS theta, CAST(0 AS BIGINT) AS cnt,
    0 AS dir, CAST(0 AS BIGINT) AS fth, CAST(0 AS BIGINT) AS fcnt
  FROM s WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, s.ts, s.p, s.p AS ref,
    CASE WHEN s.p > r.ref THEN 1 WHEN s.p < r.ref THEN -1 ELSE r.sgn END AS sgn,
    CASE WHEN abs(r.theta + (CASE WHEN s.p > r.ref THEN 1 WHEN s.p < r.ref THEN -1 ELSE r.sgn END)) >= 4
         THEN CAST(0 AS BIGINT)
         ELSE r.theta + (CASE WHEN s.p > r.ref THEN 1 WHEN s.p < r.ref THEN -1 ELSE r.sgn END) END AS theta,
    CASE WHEN abs(r.theta + (CASE WHEN s.p > r.ref THEN 1 WHEN s.p < r.ref THEN -1 ELSE r.sgn END)) >= 4
         THEN CAST(0 AS BIGINT) ELSE r.cnt + 1 END AS cnt,
    CASE WHEN abs(r.theta + (CASE WHEN s.p > r.ref THEN 1 WHEN s.p < r.ref THEN -1 ELSE r.sgn END)) >= 4
         THEN CASE WHEN r.theta + (CASE WHEN s.p > r.ref THEN 1 WHEN s.p < r.ref THEN -1 ELSE r.sgn END) > 0
              THEN 1 ELSE -1 END
         ELSE 0 END AS dir,
    r.theta + (CASE WHEN s.p > r.ref THEN 1 WHEN s.p < r.ref THEN -1 ELSE r.sgn END) AS fth,
    r.cnt + 1 AS fcnt
  FROM rec r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT CAST(user_id AS VARCHAR) AS ticker, ts, dir AS direction,
  fth AS theta, fcnt AS n_ticks, rn AS n
FROM rec WHERE dir <> 0""",

    // range-based realized volatility: q17's candle aggregate (unrounded)
    // -> per-(series, day) Parkinson / Garman-Klass / Rogers-Satchell
    // means; non-dyadic constants ride as string-cast doubles, each term
    // is ratio->ln->product (one correctly-rounded op per step), floor
    // rounding (no -0.0 on the sign-crossing GK/RS)
    "q157_range_volatility" ->
      s"""WITH cd AS (
  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
    arg_min(value, event_id) AS op, max(value) AS hi,
    min(value) AS lo, arg_max(value, event_id) AS cl
  FROM events
  GROUP BY 1, 2
)
SELECT event_type, strftime(date_trunc('day', bucket_start), '%Y-%m-%d') AS day,
  count(*) AS n_bars,
  floor((avg(ln(hi/lo) * ln(hi/lo)) / CAST('${graft.analytics.Indicators.ParkinsonDenom}' AS DOUBLE))
    * 1000000 + 0.5) / 1000000 AS parkinson,
  floor(avg(0.5 * ln(hi/lo) * ln(hi/lo)
      - CAST('${graft.analytics.Indicators.GarmanKlassC}' AS DOUBLE) * ln(cl/op) * ln(cl/op))
    * 1000000 + 0.5) / 1000000 AS garman_klass,
  floor(avg(ln(hi/cl) * ln(hi/op) + ln(lo/cl) * ln(lo/op))
    * 1000000 + 0.5) / 1000000 AS rogers_satchell
FROM cd WHERE lo > 0
GROUP BY 1, 2""",

    // curation capstone: the q131 quality CTEs gate the corpus, q21's
    // min-id-per-sha256 removes exact copies, the q22 minhash pairs +
    // q72 recursive closure over the SURVIVORS give clusters, q136's
    // rank keeps the best copy, q135's grp-hash cuts the 20% test side,
    // q142's sqrt-temperature rates mix the training tokens — one CTE
    // chain, each fragment identical to its individually-verified twin
    "q155_curation_capstone" ->
      s"""WITH RECURSIVE $qualityPCtes, gate AS (
  SELECT d.doc_id, d.source, d.text, p.quality_p
  FROM documents d JOIN p ON d.doc_id = p.doc_id
  WHERE p.quality_p >= 0.5e0
), exact AS (
  SELECT doc_id, source, text, quality_p FROM (
    SELECT gate.*, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
    FROM gate
  ) WHERE rn = 1
), ${minhashPairsCteOver("exact")},
${closureCtes("pairs", "doc_a", "doc_b")}, comp AS (
  SELECT id, min(lab) AS grp FROM reach GROUP BY id
), g AS (
  SELECT e.doc_id, e.source, e.text, e.quality_p, coalesce(c.grp, e.doc_id) AS grp
  FROM exact e LEFT JOIN comp c ON e.doc_id = c.id
), r AS (
  SELECT g.*, row_number() OVER (PARTITION BY grp ORDER BY quality_p DESC, doc_id) AS rk
  FROM g
), train AS (
  SELECT doc_id, source, text FROM r
  WHERE rk = 1
    AND CAST(('0x' || substr(md5(CAST(grp AS VARCHAR)), 1, 15)) AS BIGINT)
          / 1152921504606846976.0 >= 0.2e0
), toks AS (
  SELECT doc_id, source,
    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS ntok
  FROM train
), tot AS (
  SELECT source, CAST(sum(ntok) AS BIGINT) AS toks FROM toks GROUP BY source
), wts AS (
  SELECT source, toks,
    CAST(floor(sqrt(CAST(toks AS DOUBLE)) * 1000000) AS BIGINT) AS w
  FROM tot
), rates AS (
  SELECT source,
    CASE WHEN toks = 0 THEN 1.0
         ELSE LEAST(1.0, CAST(0.3 AS DOUBLE) * CAST((SELECT sum(toks) FROM wts) AS DOUBLE)
           * CAST(w AS DOUBLE)
           / CAST((SELECT sum(w) FROM wts) AS DOUBLE)
           / CAST(toks AS DOUBLE)) END AS rate
  FROM wts
)
SELECT t.source, count(*) AS n_docs, CAST(sum(t.ntok) AS BIGINT) AS n_tokens
FROM toks t JOIN rates r2 ON t.source = r2.source
WHERE CAST(('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        / 1152921504606846976.0 < r2.rate
GROUP BY t.source""",

    // bigram surprisal, precomputed-tables/OOV form: count tables from
    // the even-doc_id half only, every doc scored with LEFT joins —
    // unseen pair/context -> zero conditional term, OOV word -> add-one
    // floor (c=1); the context table derives from the bigram table
    // (sum over w), mirroring the operator
    "q156_bigram_oov" ->
      """WITH tk AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS t
  FROM documents
), pr AS (
  SELECT doc_id, t[i] AS v, t[i+1] AS w
  FROM tk, LATERAL (SELECT unnest(range(1, len(t))) AS i) r
  WHERE len(t) >= 2
), bg AS (
  SELECT v, w, CAST(count(*) AS BIGINT) AS cbw
  FROM pr WHERE doc_id % 2 = 0 GROUP BY 1, 2
), cx AS (
  SELECT v, CAST(sum(cbw) AS BIGINT) AS cv FROM bg GROUP BY 1
), ug AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(t) AS tok FROM tk WHERE doc_id % 2 = 0) GROUP BY 1
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS t FROM ug
)
SELECT p.doc_id, count(*) AS n_bigrams,
  floor(avg(-ln(0.75 * COALESCE(CAST(b.cbw AS DOUBLE) / CAST(c.cv AS DOUBLE), 0.0)
      + 0.25 * COALESCE(CAST(u.c AS DOUBLE), 1.0) / CAST(tot.t AS DOUBLE)))
    * 1000000 + 0.5) / 1000000 AS surprisal
FROM pr p
LEFT JOIN bg b ON p.v = b.v AND p.w = b.w
LEFT JOIN cx c ON p.v = c.v
LEFT JOIN ug u ON p.w = u.tok
CROSS JOIN tot
GROUP BY p.doc_id""",

    // triple-barrier labels: forward list frame, first-touch positions
    // via list_position over the +1/-1/0 transform (0 when absent in
    // both engines), vertical barrier -> label 0 / null touch
    "q147_triple_barrier" ->
      """WITH f AS (
  SELECT event_id, user_id, value,
    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN 1 FOLLOWING AND 20 FOLLOWING) AS fwd
  FROM events WHERE value > 0
), t AS (
  SELECT event_id, user_id,
    COALESCE(list_position(list_transform(fwd,
      x -> CASE WHEN x >= value * 1.25 THEN 1
                WHEN x <= value * 0.75 THEN -1 ELSE 0 END), 1), 0) AS p1,
    COALESCE(list_position(list_transform(fwd,
      x -> CASE WHEN x >= value * 1.25 THEN 1
                WHEN x <= value * 0.75 THEN -1 ELSE 0 END), -1), 0) AS pm
  FROM f
)
SELECT event_id, user_id,
  CASE WHEN p1 > 0 AND (pm = 0 OR p1 < pm) THEN 1
       WHEN pm > 0 AND (p1 = 0 OR pm < p1) THEN -1
       ELSE 0 END AS label,
  CAST(CASE WHEN p1 > 0 AND (pm = 0 OR p1 < pm) THEN p1
            WHEN pm > 0 AND (p1 = 0 OR pm < p1) THEN pm END AS BIGINT) AS t_touch
FROM t""",

    // budget-constrained quality selection: q131's quality CTEs ->
    // micro-quantized score levels -> per-level token totals -> one
    // descending cum window finds full levels + the boundary level and
    // remainder -> boundary taken in doc_id order
    "q153_budget_select" ->
      (s"""WITH $qualityPCtes, toks AS (
  SELECT d.doc_id, d.source,
    CAST(len(list_filter(regexp_split_to_array(d.text, '\\s+'), x -> len(x) > 0)) AS BIGINT) AS ntokens,
    CAST(floor(p.quality_p * 1000000 + 0.5) AS BIGINT) AS su
  FROM documents d JOIN p ON d.doc_id = p.doc_id
), lv AS (
  SELECT su, CAST(sum(ntokens) AS BIGINT) AS ltok FROM toks GROUP BY su
), cum AS (
  SELECT su, ltok,
    CAST(sum(ltok) OVER (ORDER BY su DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumincl,
    CAST(floor(0.3 * CAST((SELECT sum(ltok) FROM lv) AS DOUBLE)) AS BIGINT) AS b
  FROM lv
), sel AS (
  SELECT su, cumincl <= b AS fullv,
    (cumincl - ltok) < b AND cumincl > b AS partv,
    b - (cumincl - ltok) AS rem
  FROM cum WHERE cumincl <= b OR ((cumincl - ltok) < b AND cumincl > b)
), fullr AS (
  SELECT t.doc_id, t.source, t.ntokens
  FROM toks t JOIN sel s ON t.su = s.su AND s.fullv
), partr AS (
  SELECT doc_id, source, ntokens FROM (
    SELECT t.doc_id, t.source, t.ntokens, s.rem,
      sum(t.ntokens) OVER (PARTITION BY t.su ORDER BY t.doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
    FROM toks t JOIN sel s ON t.su = s.su AND s.partv
  ) WHERE run <= rem
)
SELECT source, count(*) AS n_docs, CAST(sum(ntokens) AS BIGINT) AS n_tokens
FROM (SELECT * FROM fullr UNION ALL SELECT * FROM partr)
GROUP BY source"""),

    // rolling median: sorted bounded frame + lower-median element
    // selection — pure indexing, no interpolation arithmetic. NULLs are
    // filtered from the frame before selection (Spark's collect_list
    // drops them; DuckDB's list() keeps them and list_sort places them
    // last — without the filter the two engines disagree on len and on
    // the lower-median index whenever the frame holds a null); an
    // all-null frame yields NULL, matching the operator's empty-list
    // branch.
    "q151_rolling_median" ->
      """SELECT event_id, user_id,
  CASE WHEN len(flt) = 0 THEN NULL
       ELSE (list_sort(flt))[CAST((len(flt) + 1) // 2 AS INT)] END AS med21
FROM (
  SELECT event_id, user_id,
    list_filter(
      list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 20 PRECEDING AND CURRENT ROW),
      x -> x IS NOT NULL) AS flt
  FROM events
)""",

    // average uniqueness: q147's span (touch or truncated horizon),
    // coverage = filtered count over the previous-horizon (rn, L) pairs
    // (a span can't reach further than the horizon), weight = mean
    // reciprocal coverage over the own span's slice
    "q152_label_uniqueness" ->
      """WITH base AS (
  SELECT event_id, user_id, ts, value FROM events WHERE value > 0
), lab AS (
  SELECT event_id, user_id, ts, value,
    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN 1 FOLLOWING AND 20 FOLLOWING) AS fwd,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn,
    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS nn
  FROM base
), tt AS (
  SELECT event_id, user_id, ts, rn, nn,
    COALESCE(list_position(list_transform(fwd,
      x -> CASE WHEN x >= value * 1.25 THEN 1
                WHEN x <= value * 0.75 THEN -1 ELSE 0 END), 1), 0) AS p1,
    COALESCE(list_position(list_transform(fwd,
      x -> CASE WHEN x >= value * 1.25 THEN 1
                WHEN x <= value * 0.75 THEN -1 ELSE 0 END), -1), 0) AS pm
  FROM lab
), ll AS (
  SELECT event_id, user_id, ts, rn,
    CASE WHEN p1 > 0 AND (pm = 0 OR p1 < pm) THEN 1
         WHEN pm > 0 AND (p1 = 0 OR pm < p1) THEN -1
         ELSE 0 END AS label,
    CAST(CASE WHEN p1 > 0 AND (pm = 0 OR p1 < pm) THEN p1
              WHEN pm > 0 AND (p1 = 0 OR pm < p1) THEN pm
              ELSE LEAST(20, nn - rn) END AS BIGINT) AS label_span
  FROM tt
), cov AS (
  SELECT event_id, user_id, ts, rn, label, label_span,
    list(struct_pack(rn := rn, l := label_span)) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS prev
  FROM ll
), cc AS (
  SELECT event_id, user_id, ts, rn, label, label_span,
    CASE WHEN prev IS NULL THEN 0
         ELSE len(list_filter(prev, p -> p.l >= rn - p.rn)) END AS c
  FROM cov
), inv AS (
  SELECT event_id, user_id, label, label_span,
    list(CASE WHEN c = 0 THEN 0.0 ELSE 1.0 / c END) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN 1 FOLLOWING AND 20 FOLLOWING) AS finv
  FROM cc
)
SELECT event_id, user_id, label, label_span,
  CASE WHEN label_span = 0 THEN NULL
       ELSE floor((list_sum(finv[1:CAST(label_span AS INT)]) / label_span)
              * 1000000 + 0.5) / 1000000 END AS uniqueness
FROM inv""",

    // PSI drift: reference-fitted fixed-width bins (first time-half),
    // edge-bin clamping for out-of-range current values, Laplace
    // smoothing so empty bins stay finite, sr6-pinned sum
    "q150_psi_drift" ->
      """WITH tb AS (
  SELECT min(epoch_us(ts)) AS tmn, max(epoch_us(ts)) AS tmx FROM events
), m AS (
  -- NULL ts must land in the reference population in BOTH the bin fit
  -- (bd's NOT cur) and the histogram (cnt's CASE) — Drift coalesces
  -- NULL->false in both places, so the oracle pins the same flag once
  SELECT event_type, CAST(value AS DOUBLE) AS v,
    COALESCE(epoch_us(ts) * 2 >= tmn + tmx, FALSE) AS cur
  FROM events, tb
), bd AS (
  SELECT event_type, min(v) AS mn, max(v) AS mx
  FROM m WHERE NOT cur GROUP BY 1
), binned AS (
  SELECT m.event_type,
    CASE WHEN bd.mx = bd.mn THEN 0
         ELSE CAST(GREATEST(LEAST(floor((m.v - bd.mn) * 10 / (bd.mx - bd.mn)), 9.0), 0.0) AS INT) END AS bin,
    m.cur
  FROM m JOIN bd ON m.event_type = bd.event_type
), cnt AS (
  SELECT event_type, bin,
    CAST(sum(CASE WHEN cur THEN 0 ELSE 1 END) AS BIGINT) AS rc,
    CAST(sum(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT) AS cc
  FROM binned GROUP BY 1, 2
), spine AS (
  SELECT b.event_type, CAST(unnest(range(10)) AS INT) AS bin FROM bd b
), filled AS (
  SELECT s.event_type, s.bin, COALESCE(c.rc, 0) AS rc, COALESCE(c.cc, 0) AS cc
  FROM spine s LEFT JOIN cnt c ON s.event_type = c.event_type AND s.bin = c.bin
), tot AS (
  SELECT event_type, rc, cc,
    CAST(sum(rc) OVER (PARTITION BY event_type) AS BIGINT) AS rn,
    CAST(sum(cc) OVER (PARTITION BY event_type) AS BIGINT) AS cn
  FROM filled
)
SELECT event_type, CAST(max(rn) AS BIGINT) AS n_ref, CAST(max(cn) AS BIGINT) AS n_cur,
  floor(sum(
    (CAST(rc + 1 AS DOUBLE) / CAST(rn + 10 AS DOUBLE)
       - CAST(cc + 1 AS DOUBLE) / CAST(cn + 10 AS DOUBLE))
    * ln((CAST(rc + 1 AS DOUBLE) / CAST(rn + 10 AS DOUBLE))
       / (CAST(cc + 1 AS DOUBLE) / CAST(cn + 10 AS DOUBLE)))) * 1000000 + 0.5) / 1000000
    AS psi
FROM tot GROUP BY event_type""",

    // volume bars: per-row micro-quantized volumes (exact BIGINT running
    // sum — a double cumsum under a floor would be association-order
    // sensitive and the bar id is a GROUP BY key that cannot be rounded
    // after the fact), exclusive cum -> bar = cum // threshold_micros (a
    // bar closes WITH the crossing row), OHLC via arg_min/arg_max
    "q148_volume_bars" ->
      """WITH c AS (
  SELECT event_type, ts, event_id, value,
    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vu
  FROM events WHERE value > 0
), r AS (
  SELECT event_type, ts, event_id, value,
    COALESCE(sum(vu) OVER (PARTITION BY event_type ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM c
)
SELECT event_type, CAST(cum // 2000000000 AS BIGINT) AS bar,
  count(*) AS n_ticks,
  round(arg_min(value, event_id), 4) AS open,
  round(max(value), 4) AS high,
  round(min(value), 4) AS low,
  round(arg_max(value, event_id), 4) AS close,
  floor(sum(value) * 1000000 + 0.5) / 1000000 AS volume
FROM r GROUP BY 1, 2""",

    // symmetric CUSUM event filter (X23 batch twin): the reset-on-trigger
    // recurrence — S+ := max(0, S+ + dx), S- := min(0, S- + dx), fire and
    // zero both when |S| crosses h — is outside every window frame, so
    // the oracle is a RECURSIVE CTE advancing all keys one row per
    // iteration (iterations = max rows per key, not total rows). Prices
    // take one float32 round (CAST AS REAL == Spark .cast("float")),
    // then pure double arithmetic in program order — bit-identical to
    // cusumFold. The 0-as-DOUBLE casts stop DuckDB typing the anchor's
    // accumulators as DECIMAL (which the recursive arm cannot widen).
    "q154_cusum_events" ->
      """WITH RECURSIVE s AS (
  SELECT user_id, ts, CAST(CAST(value AS REAL) AS DOUBLE) AS p,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS rn
  FROM events
), rec AS (
  SELECT user_id, rn, ts, p, p AS ref,
    CAST(0 AS DOUBLE) AS sp, CAST(0 AS DOUBLE) AS sn, 0 AS dir
  FROM s WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.rn, s.ts, s.p, s.p AS ref,
    CASE WHEN GREATEST(CAST(0 AS DOUBLE), r.sp + (s.p - r.ref)) > 100.0
           OR LEAST(CAST(0 AS DOUBLE), r.sn + (s.p - r.ref)) < -100.0
         THEN CAST(0 AS DOUBLE)
         ELSE GREATEST(CAST(0 AS DOUBLE), r.sp + (s.p - r.ref)) END AS sp,
    CASE WHEN GREATEST(CAST(0 AS DOUBLE), r.sp + (s.p - r.ref)) > 100.0
           OR LEAST(CAST(0 AS DOUBLE), r.sn + (s.p - r.ref)) < -100.0
         THEN CAST(0 AS DOUBLE)
         ELSE LEAST(CAST(0 AS DOUBLE), r.sn + (s.p - r.ref)) END AS sn,
    CASE WHEN GREATEST(CAST(0 AS DOUBLE), r.sp + (s.p - r.ref)) > 100.0 THEN 1
         WHEN LEAST(CAST(0 AS DOUBLE), r.sn + (s.p - r.ref)) < -100.0 THEN -1
         ELSE 0 END AS dir
  FROM rec r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT CAST(user_id AS VARCHAR) AS ticker, ts, p AS price,
  dir AS direction, rn AS n
FROM rec WHERE dir <> 0""",
  )
}
