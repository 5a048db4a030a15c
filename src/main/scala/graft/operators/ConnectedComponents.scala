package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * cluster-assembly step that turns pairwise near-dup EDGES into
  * dedup CLUSTERS (cluster id = smallest doc id reachable), i.e. the
  * step between "these pairs are near-duplicates" and "keep one doc
  * per group".
  *
  * Shape: symmetrize the edges once, then iterate
  * `label := min(label, min(neighbors' labels))` until a fixpoint.
  * Each iteration is one equi-join + one aggregation — fully
  * distributed, no driver-side data. The driver only runs the loop
  * and a 1-row convergence probe: labels only ever decrease, so
  * `sum(label)` is strictly monotone until the fixpoint and equality
  * detects convergence without a row-level diff.
  *
  * Each iteration's labels are pinned with an eager localCheckpoint:
  * it truncates the growing lineage (the classic iterative-algorithm
  * requirement) and freezes the iterate so the convergence probe and
  * the next join read the same data; blocks are released by the
  * ContextCleaner once unreferenced.
  *
  * Scale notes: propagation converges in O(graph diameter) rounds —
  * near-dup clusters are small and dense, so a handful of rounds in
  * practice (`maxIters` is a safety bound, not the expected count).
  * For adversarially long chains at 100 TB the same loop would host
  * the large-star/small-star rewrite (O(log n) rounds) — the
  * per-round dataflow (join + min-aggregate) is identical, only the
  * edge rewrite between rounds changes.
  */
object ConnectedComponents {

  /** @param nodes  one row per node: column `doc_id`
    * @param edges  undirected edges as columns `doc_a`, `doc_b`
    * @return (doc_id, cluster_id) — cluster_id = min doc_id of the
    *         component (a singleton's cluster_id is itself)
    */
  def components(nodes: DataFrame, edges: DataFrame, maxIters: Int = 32): DataFrame = {
    // materialize the edge list ONCE before symmetrizing: a union of
    // the raw frame with its flipped self would execute the (possibly
    // expensive) edge-producing subtree twice; the symmetrized view is
    // then two cheap projections of the snapshot per round.
    val e0 = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .localCheckpoint()
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    var labels = nodes.select(col("doc_id"), col("doc_id").as("label"))
      .localCheckpoint()
    // sum over zero rows is NULL — an empty node set must yield an
    // empty labeling, not an NPE
    def labelSum(df: DataFrame): Long =
      Option(df.agg(sum("label")).head.get(0)).fold(0L)(_.asInstanceOf[Long])
    var prevSum = labelSum(labels)
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      val nmin = sym
        .join(labels.select(col("doc_id").as("dst_id"), col("label").as("dst_label")),
          col("dst") === col("dst_id"))
        .groupBy(col("src")).agg(min("dst_label").as("nmin"))
      labels = labels
        .join(nmin, col("doc_id") === col("src"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint()
      val s = labelSum(labels)
      converged = s == prevSum
      prevSum = s
      iters += 1
    }
    require(converged, s"component labels did not converge in $maxIters rounds " +
      "(graph diameter exceeds the bound — raise maxIters or switch the loop " +
      "body to the large-star/small-star rewrite)")
    labels.select(col("doc_id"), col("label").as("cluster_id"))
  }
}
