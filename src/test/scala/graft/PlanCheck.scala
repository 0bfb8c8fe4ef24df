package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

/** Shared plan-inspection helpers for the shape specs.
  *
  * Spark 4 AQE wraps materialized stages — INCLUDING the final result stage
  * (ResultQueryStageExec, new in 4.x) — in QueryStageExec nodes, which are
  * LEAVES: the executed subtree hangs off their `plan` member, not their
  * children, so `TreeNode.collect` never reaches it. A naive
  * `plan.collect { case s: ShuffleQueryStageExec => ... }` on a final plan
  * rooted at a ResultQueryStage therefore counts ZERO shuffles for every
  * query, and `<=` budgets pass vacuously (found r12 — the twin assertion
  * in LayoutSkewSpec was the first `>=` check and caught it). Every
  * traversal here descends through stage wrappers explicitly.
  */
object PlanCheck {

  /** Shuffle exchanges in `plan`, descending through query-stage leaves.
    * ReusedExchange subtrees count zero (reuse is the point); broadcast
    * exchanges count zero (they don't scale with data). */
  def countShuffles(plan: SparkPlan): Int = plan match {
    case q: QueryStageExec => countShuffles(q.plan)
    case _: ReusedExchangeExec => 0
    case e: ShuffleExchangeLike => 1 + e.children.map(countShuffles).sum
    case p => p.children.map(countShuffles).sum
  }

  /** Every node of the executed tree, stage wrappers transparent. */
  def flatten(plan: SparkPlan): Seq[SparkPlan] = plan +: (plan match {
    case q: QueryStageExec => flatten(q.plan)
    case p => p.children.flatMap(flatten)
  })

  /** Execute `df` through its OWN QueryExecution (collect(), not count() —
    * count() builds a separate QueryExecution and leaves this one's
    * AdaptiveSparkPlanExec at the initial plan) and return the finalized
    * adaptive plan, so AQE's runtime re-planning is what gets inspected. */
  def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  def shufflesOf(df: DataFrame): Int = {
    val n = countShuffles(finalPlan(df))
    graft.operators.ScaleOps.releaseTracked()
    n
  }
}
