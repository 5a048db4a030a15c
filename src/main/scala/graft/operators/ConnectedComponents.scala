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
  * For adversarially long chains (diameter ≫ log n) use
  * [[componentsAlternating]] — the large-star/small-star rewrite with
  * a polylog round bound; its per-round dataflow is the same
  * join + min-aggregate class, only the edge rewrite between rounds
  * changes.
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
      Option(df.agg(sum("label")).head().get(0)).fold(0L)(_.asInstanceOf[Long])
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
      "(graph diameter exceeds the bound — raise maxIters or use " +
      "componentsAlternating, whose round count is polylog in n)")
    labels.select(col("doc_id"), col("label").as("cluster_id"))
  }

  /** Connected components by the alternating large-star/small-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — the adversarial-diameter upgrade over [[components]]:
    * each round HALVES tree heights instead of walking one hop, so a
    * path graph of n nodes resolves in O(log n)-ish rounds (the paper
    * proves a polylog bound for the alternating schedule) where
    * min-label propagation needs n−1.
    *
    * Edges are kept canonically oriented large→small. One round is:
    *   large-star: every node u links each LARGER neighbor v to
    *     m = min(Γ(u) ∪ {u})  — emits (v, m);
    *   small-star: every node u (over its smaller neighbors) links
    *     each of them, and itself, to that minimum.
    * Both steps are one groupBy-min + one equi-join + distinct —
    * fully distributed, same dataflow class as a round of
    * [[components]]. Endpoints only ever decrease, and the unique
    * fixpoint is a star per component centered on its minimum.
    *
    * Convergence probe, two-tier: each round computes a 1-row
    * SIGNATURE of the edge set — (count, sum(src), sum(dst)) in one
    * aggregate job — and only when the signature repeats does the
    * exact set test (`except` over two distinct canonical sets) run
    * to confirm. Endpoints are non-increasing round over round, so
    * the signature is stationary at — and in practice only at — the
    * fixpoint; the `except` confirmation keeps the test EXACT even if
    * a signature collision ever occurred (a collision merely costs
    * one extra `except`, never a wrong answer). Net: one small agg
    * per round instead of the former two full-set jobs
    * (count + except), with identical output.
    */
  def componentsAlternating(nodes: DataFrame, edges: DataFrame,
      maxIters: Int = 40): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val mn = sym.groupBy("src").agg(min("dst").as("mnd"))
      sym.join(mn, "src")
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), least(col("mnd"), col("src")).as("dst"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      // e is oriented src > dst, so grouping by src ranges over each
      // node's SMALLER neighbors; m is then min(Γ_small(u) ∪ {u}).
      val mn = e.groupBy("src").agg(min("dst").as("m"))
      val linked = e.join(mn, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
        .where(col("src") =!= col("dst"))
      linked.union(mn.select(col("src"), col("m").as("dst"))).distinct()
    }
    var e = edges
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .where(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("src"), least(col("a"), col("b")).as("dst"))
      .distinct()
      .localCheckpoint()
    // (count, sum(src), sum(dst)) in ONE 1-row aggregate — sums are
    // null on an empty set, normalized to 0 so signatures stay
    // comparable
    def signature(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)), sum("src"), sum("dst")).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    var sig = signature(e)
    var converged = sig._1 == 0L
    var iters = 0
    while (!converged && iters < maxIters) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val nextSig = signature(next)
      // cheap stationarity first; the exact set test (both sides are
      // distinct canonical sets, so equal counts + empty one-sided
      // difference ⇔ set equality) runs only on a signature match —
      // normally exactly once, at the true fixpoint
      converged = nextSig == sig && next.except(e).isEmpty
      sig = nextSig
      e = next
      iters += 1
    }
    require(converged, s"alternating components did not converge in $maxIters rounds")
    // fixpoint is a star per component: every non-minimum node carries
    // exactly one edge (node → component min); minima and singletons
    // carry none and label themselves
    val roots = e.groupBy(col("src").as("doc_id")).agg(min("dst").as("root"))
    nodes.select(col("doc_id"))
      .join(roots, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("cluster_id"))
  }
}
