package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TxParquetTable

/** X89: the PERSISTED ANN index — similarity search as a maintained
  * lakehouse ARTIFACT instead of an in-query rebuild.
  *
  * Every in-query form (q43/q66/q112/q140/q166) re-derives
  * centroids/codebooks per query; at 100 TB the index is fit ONCE,
  * persisted, and maintained incrementally — exactly the X27 (persisted
  * bigram tables) / X28 (CDC increment) pattern applied to X3. Two
  * [[graft.sources.TxParquetTable]] artifacts under `path`:
  *
  *   - `path/centroids` — the tiny index head (cell, centroid), one
  *     commit per fit;
  *   - `path/assignments` — (id, v, cell) for every indexed vector,
  *     zone-mapped AND range-clustered on `cell`
  *     ([[TxParquetTable.compact]] clusterBy), so a query's probed
  *     cells prune to the FILES that can hold them
  *     ([[TxParquetTable.snapshotRange]]) — the IVF inverted list
  *     rendered as data-skipping file layout.
  *
  * Maintenance modes (measured against each other in
  * `docs/BENCH_NOTES.md`):
  *   - [[fitIvfIndex]] — full fit into a FRESH path (Lloyd iterations
  *     over the whole corpus). Rebuilds swap paths blue/green; fitting
  *     into a live path fails loudly rather than silently mixing two
  *     centroid generations.
  *   - [[extendIvfIndex]] — the incremental mode: assign ONLY the new
  *     vectors against the persisted centroids (one map-only scan of
  *     the increment + one append commit, CDC-readable via
  *     `graft_tx_changes`). Cost is O(increment), not O(corpus); the
  *     price is centroid staleness — after enough drift, refit.
  *     Ids must be NEW (the CDC-increment contract; re-ingesting an id
  *     would double-list it — rebuild instead).
  *
  * Queries ([[queryIvfIndex]]) serve from the artifacts alone: collect
  * the centroid head (tiny by the √n sizing), choose probe cells per
  * query on the driver, read ONLY those cells' files through the zone
  * maps, score exactly inside. Recall vs exact search is gated by q227
  * at the q66 operating point.
  */
object AnnIndex {

  private def centroidsPath(path: String) = s"$path/centroids"
  private def assignmentsPath(path: String) = s"$path/assignments"

  /** Full IVF fit persisted under a FRESH `path`. Returns the number of
    * vectors indexed.
    */
  def fitIvfIndex(embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, nCells: Int, path: String, lloydIters: Int = 1,
      targetFiles: Int = 8): Long = {
    val spark = embeddings.sparkSession
    require(TxParquetTable.latestVersion(centroidsPath(path)) < 0 &&
        TxParquetTable.latestVersion(assignmentsPath(path)) < 0,
      s"fitIvfIndex: $path already holds an index — a refit must land in " +
        "a fresh path (blue/green swap) so readers never mix two centroid " +
        "generations; extend an existing index with extendIvfIndex")
    val (centroids, assigned) =
      Similarity.ivfIndex(embeddings, idCol, vecCol, dim, nCells, lloydIters)
    TxParquetTable.append(centroids, centroidsPath(path))
    TxParquetTable.append(assigned.select(col("id"), col("v"), col("cell")),
      assignmentsPath(path), statsColumns = Seq("cell"))
    // range-cluster on cell: probed-cell reads prune to O(files/nCells)
    TxParquetTable.compact(spark, assignmentsPath(path), "id",
      targetFiles = targetFiles, clusterBy = Some("cell"))
    TxParquetTable.rowCount(assignmentsPath(path)).getOrElse(-1L)
  }

  /** Incremental maintenance: assign `newVectors` against the PERSISTED
    * centroids (map-only over the increment) and append them as one
    * CDC-readable commit. Returns the committed assignments version.
    */
  def extendIvfIndex(newVectors: DataFrame, idCol: String, vecCol: String,
      path: String): Long = {
    val spark = newVectors.sparkSession
    val cents = Similarity.collectCentroids(
      TxParquetTable.snapshot(spark, centroidsPath(path)))
    val cellIds = cents.map(_._1).toSeq
    val vecs = cents.map(_._2.toSeq).toSeq
    // no forced repartition: the assign is a cheap map (k dot products
    // per row against a literal matrix) and a blown-up partition count
    // would fragment the assignments table one tiny file per partition
    val assigned = newVectors
      .select(col(idCol).as("id"), Similarity.asDouble(col(vecCol)).as("v"))
      .withColumn("cell", graft.functions.NearestCentroidCell
        .nearestCentroidCell(col("v"), cellIds, vecs))
    TxParquetTable.append(assigned, assignmentsPath(path),
      statsColumns = Seq("cell"))
  }

  /** Log-only count of indexed vectors (no data file opened). */
  def indexedCount(path: String): Long =
    TxParquetTable.rowCount(assignmentsPath(path)).getOrElse(0L)

  /** Coalesce a sorted distinct cell list into maximal consecutive
    * runs — one zone-map-pruned read per RUN instead of per cell (a
    * query set probing most cells degenerates to one full-range read,
    * which is also the right plan there).
    */
  private[llmops] def cellRuns(cells: Seq[Int]): Seq[(Int, Int)] =
    cells.foldLeft(List.empty[(Int, Int)]) {
      case ((lo, hi) :: rest, c) if c == hi + 1 => (lo, c) :: rest
      case (acc, c) => (c, c) :: acc
    }.reverse

  /** Serve approximate top-k from the persisted index: probe cells per
    * query on the driver against the persisted centroid head, read only
    * the probed cells' files (one zone-map-pruned
    * [[TxParquetTable.snapshotRange]] per consecutive RUN of probed
    * cells — the clustered layout makes each a near-contiguous read;
    * sparse probes over many cells stay per-cell reads), then the q66
    * pruned scan + bounded-top-k aggregate.
    */
  def queryIvfIndex(spark: SparkSession, path: String, queries: DataFrame,
      qidCol: String, qVecCol: String, nProbe: Int, k: Int,
      excludeSelfId: Boolean = false): DataFrame = {
    val centroids = TxParquetTable.snapshot(spark, centroidsPath(path))
    val cents = Similarity.collectCentroids(centroids)
    val probed = queries.select(col(qVecCol)).collect()
      .flatMap(r => Similarity.probeCells(cents, r.getSeq[Double](0).toArray, nProbe))
      .distinct.sorted.toSeq
    require(probed.nonEmpty, "queryIvfIndex: no probe cells (empty query frame?)")
    // every interior cell of a run is probed by construction (runs only
    // extend on consecutive values), so no residual filter is needed;
    // ivfTopKBatch's (qid, cell) probe join keeps per-query pruning
    val scan = cellRuns(probed).map { case (lo, hi) =>
        TxParquetTable.snapshotRange(
          spark, assignmentsPath(path), "cell", Some(lo), Some(hi))
      }.reduce(_ unionByName _)
    Similarity.ivfTopKBatch(centroids, scan, queries, qidCol, qVecCol,
      nProbe, k, excludeSelfId)
  }
}
