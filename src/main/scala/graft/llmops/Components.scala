package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * stage that turns near-duplicate candidate PAIRS (q22/q40's output)
  * into duplicate GROUPS so a curation pipeline can keep exactly one
  * representative per cluster. Pair-based dropping ("remove doc_b of
  * every pair") over-deletes on chains (a-c, b-c drops b although b
  * duplicates nothing kept); component-based dedup keeps one doc per
  * transitive cluster.
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with itself; each round a node's label becomes the min of
  * its own and its neighbors' labels; at fixpoint every node carries
  * the min node id of its component. Each round is one shuffle-join
  * (labels ⋈ edges on the source endpoint) plus one min-aggregate —
  * no driver-side graph state, so it scales to edge lists that dwarf
  * executor memory.
  *
  * Scale notes for the 100 TB mandate:
  *   - rounds needed = graph diameter. Near-dup clusters are small and
  *     dense (shingle overlap is transitive-ish), so diameter is tiny;
  *     the default `maxIters` is a safety rail, not a budget.
  *   - label state is truncated with `localCheckpoint` each round —
  *     without it the join lineage doubles per iteration and Catalyst
  *     re-plans the whole history (classic iterative-Spark trap).
  *   - convergence is detected by the label-sum invariant: labels only
  *     ever decrease, so an unchanged sum(label) means a fixpoint — a
  *     one-scalar aggregate instead of a changed-rows anti-join.
  *   - for adversarial graphs with long chains / huge components, the
  *     published upgrade path is the large-star/small-star algorithm
  *     (Kiveris et al., "Connected Components in MapReduce and Beyond",
  *     SoCC 2014), which converges in O(log n) rounds with the same
  *     join+min building blocks. Not needed for dedup-shaped graphs.
  */
object Components {

  /** Component assignment for every node of the (undirected) edge list:
    * (id, component) where `component` is the minimum node id reachable
    * from `id`. Isolated nodes never appear in `edges` and so are their
    * own implicit singleton components — callers wanting them listed
    * can union the node universe in.
    *
    * @param edges one row per undirected edge; self-loops and duplicate
    *              edges are tolerated (they cannot change the fixpoint)
    */
  def connectedComponents(
      edges: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 25): DataFrame = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    val fwd = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
    // undirected: propagate both ways; persist — reused every round
    val bi = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint()

    var labels = bi.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var prevSum = checkSum(labels)
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      val msgs = bi.join(labels, bi("src") === labels("id"))
        .select(bi("dst").as("id"), labels("label"))
      val next = labels.select(col("id"), col("label")).union(msgs)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      val sum = checkSum(next)
      converged = sum == prevSum
      prevSum = sum
      labels = next
      iter += 1
    }
    labels
  }

  /** One-scalar convergence probe: sum of labels (exact decimal — label
    * ids can be any long, so a double sum could hide a change in
    * rounding). Labels are monotone non-increasing under min-propagation,
    * so equal consecutive sums imply a fixpoint.
    */
  private def checkSum(labels: DataFrame): java.math.BigDecimal =
    labels.agg(sum(col("label").cast("decimal(38,0)")).as("s"))
      .head.getDecimal(0)

  /** Component-based near-duplicate removal: keep, per transitive
    * duplicate cluster, only the row whose `idCol` equals the component
    * minimum; rows not in any pair pass through untouched (left-anti
    * against the non-representative member list, so the corpus side is
    * scanned once and never shuffled on text).
    */
  def dedupByComponents(
      docs: DataFrame, pairs: DataFrame,
      idCol: String, aCol: String, bCol: String): DataFrame = {
    val drop = connectedComponents(pairs, aCol, bCol)
      .filter(col("id") =!= col("label"))
      .select(col("id").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }
}
