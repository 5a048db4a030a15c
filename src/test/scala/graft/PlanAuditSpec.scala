package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Global scale-invariant audit over EVERY registered query's physical
  * plan (pre-AQE; none of the audited plans execute, though building
  * the dedup family's DataFrames does trigger the one-time
  * SharedIndex build as a construction-time side effect). Pins the
  * two properties the 100 TB design depends on and that a local-mode
  * test run can't catch by timing alone:
  *
  *   1. No `CartesianProduct` anywhere — a data×data cartesian works
  *      at sf0.001 and detonates at scale.
  *   2. `BroadcastNestedLoopJoin` only where the build side is a
  *      deliberate 1-row scalar broadcast (dim-cardinality / max-ts
  *      anchors) or the broadcast ANN query set — enumerated below, so
  *      an accidental non-equi join in any OTHER query fails the
  *      suite instead of shipping as a silent quadratic term.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries where a BroadcastNestedLoopJoin is a reviewed, deliberate
    * scalar/bounded broadcast (see PLANS.md audit summary).
    * x_token_pack: the triangular `pid_b < pid` offsets join of the
    * two-phase prefix sum — both sides have one row per shuffle
    * partition (bounded by cluster config, not data).
    */
  /** x_approx_profile: 1-row×1-row scalar cross-joins combining four
    * independent single-pass aggregations (see its builder comment).
    * x_pipeline_e2e: inherits x_token_pack's triangular offsets join
    * through the shared packCumSum prefix sum.
    */
  /** x_tfidf_topk / x_tfidf_topk_k5: 1-row corpus-size scalar
    * cross-joined onto the tf⋈df frame (the x_approx_profile scalar
    * pattern); k only changes the top-k filter, not the join shape.
    */
  /** x_semdedup(_t35): the x_ann_ivf centroid broadcast — every vector
    * scores the tiny fixed-seed centroid table to find its cell.
    */
  private val bnljAllowed = Set(
    "equipment_export", "opportunity_export", "p_time_topn",
    "stage_report", "x_ann_ivf", "x_ann_ivf_trained", "x_ann_ivf_trained_i2",
    "x_ann_topk", "x_approx_profile", "x_pipeline_e2e", "x_token_pack",
    "x_tfidf_topk", "x_tfidf_topk_k5", "x_semdedup", "x_semdedup_t35",
    // x_hard_negatives(_k10): the x_ann_topk broadcast-queries scan
    // with a label-mismatch (non-equi) predicate
    "x_hard_negatives", "x_hard_negatives_k10",
    // x_semdedup_incr: same centroid broadcast as x_semdedup
    "x_semdedup_incr",
    // x_semantic_decon(_t45): the x_ann_topk broadcast-bench scan —
    // deliberately brute-force, see semanticDeconOf's scaladoc
    "x_semantic_decon", "x_semantic_decon_t45",
    // x_ann_recall(_pl24): ground-truth side is the x_ann_topk
    // broadcast brute scan (the audit's cost, sampled in production)
    "x_ann_recall", "x_ann_recall_pl24",
    // x_quant_recall(_c4): BOTH sides are the x_ann_topk broadcast
    // brute scan (fine + coarse quantization), see quantRecallOf
    "x_quant_recall", "x_quant_recall_c4",
    // x_bpe_merges_r2: 1-row rank-1-merge scalar broadcast against the
    // vocabulary frame (the x_approx_profile scalar pattern)
    "x_bpe_merges_r2",
    // x_pipeline_gopher: inherits x_token_pack's triangular offsets
    // join through the shared packCumSum prefix sum, like x_pipeline_e2e
    "x_pipeline_gopher",
    // x_curriculum(_w4) / x_pipeline_order: the |sources|-row stats
    // table broadcast against the per-doc frame for the closed-form
    // schedule rank — bounded by the source count, see curriculumOf
    "x_curriculum", "x_curriculum_w4", "x_pipeline_order",
    // x_ivf_balance(_i0): the x_ann_ivf centroid broadcast — the
    // balance audit reruns the same assign scan
    "x_ivf_balance", "x_ivf_balance_i0",
    // x_shingle_growth(_b20): 1-row doc-id-bounds scalar broadcast
    // for the bin mapping (the x_approx_profile scalar pattern)
    "x_shingle_growth", "x_shingle_growth_b20",
    // x_pack_audit(_b4000): inherits x_token_pack's triangular
    // offsets join through the shared packCumSum prefix sum
    "x_pack_audit", "x_pack_audit_b4000",
    // x_session_funnel(_s2): 1-row total-sessions scalar broadcast
    // for the share column (the x_approx_profile scalar pattern)
    "x_session_funnel", "x_session_funnel_s2",
    // x_source_sketch_sim(_p16): |sources|² sketch-pair matrix — the
    // inequality join runs over one sketch row per SOURCE (catalog-
    // bounded, broadcast), never over docs or postings
    "x_source_sketch_sim", "x_source_sketch_sim_p16",
    // x_approx_profile_s20: the x_approx_profile 1-row×1-row scalar
    // cross-join, combining the full-scan sketch pass with the
    // sampled exact pass
    "x_approx_profile_s20",
    // x_bpe_merge_table / x_bpe_encode: x_bpe_merges_r2's 1-row
    // rank-1-merge scalar broadcast, once per round against the
    // vocabulary frame (encode additionally broadcasts the 1-row
    // trained-merges frame against the distinct vocab)
    "x_bpe_merge_table", "x_bpe_encode",
    // x_mix_solve: 1-row budget scalar broadcast against the
    // |sources|-row card frame (the x_approx_profile scalar pattern)
    "x_mix_solve")

  private def physical(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan

  /** `collectWithSubqueries` but robust to subqueries still carried as
    * LOGICAL plans at the `sparkPlan` stage (the `Dataset.scalar()`
    * path plans them during preparation): those are planned here the
    * same way the session would, so their joins are audited rather
    * than skipped.
    */
  private def collectNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val here = plan.collect { case p => p }
    val subPlans = here.flatMap(_.expressions.flatMap(_.collect {
      case pe: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] => pe.plan
    }))
    here ++ subPlans.flatMap {
      case sp: SparkPlan => collectNodes(sp)
      case lp: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =>
        collectNodes(spark.sessionState.executePlan(lp).sparkPlan)
      case _ => Nil
    }
  }

  test("no query plans a CartesianProduct; BNLJ only in the scalar-broadcast whitelist") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val nodes = collectNodes(physical(name))
      val cartesian = nodes.collect { case c: CartesianProductExec => c }
      val bnlj = nodes.collect { case j: BroadcastNestedLoopJoinExec => j }
      val bad = Seq(
        if (cartesian.nonEmpty) Some(s"$name: CartesianProduct") else None,
        if (bnlj.nonEmpty && !bnljAllowed(name))
          Some(s"$name: unreviewed BroadcastNestedLoopJoin") else None
      ).flatten
      bad
    }
    assert(offenders.isEmpty, s"scale-hostile joins planned:\n${offenders.mkString("\n")}")
  }
}
