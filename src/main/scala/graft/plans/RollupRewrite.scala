package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.DecimalType

/** A registered MATERIALIZED ROLLUP: `rollupDir` holds ONE row per
  * `groupCol` value of the source table at `sourceDir`, with columns
  * (`groupOut`, `countOut` = count(1), `sumOut` = sum(cast(`valCol` as
  * decimal(38,10)))) — exactly the mergeable-aggregate artifact
  * q_agg_view_maintain maintains. Registration is the caller's currency
  * contract (register after each maintenance tick), as with any
  * materialized view. */
case class RollupSpec(sourceDir: String, groupCol: String, valCol: String,
                      rollupDir: String, groupOut: String = "seg",
                      countOut: String = "n", sumOut: String = "sb")

/** TRANSPARENT MATERIALIZED-VIEW REWRITE — the classic warehouse
  * optimization (Calcite/BigQuery/Snowflake MV rewrite) as a custom
  * Catalyst `Rule[LogicalPlan]`: an `Aggregate(group by groupCol;
  * count(1) / sum(cast(valCol as decimal(38,10))) in any enclosing
  * arithmetic)` over a clean scan of a REGISTERED source table is served
  * from its maintained rollup instead — the aggregate node disappears and
  * the plan reads O(groups) rollup rows, never the corpus. Correctness
  * rests on the same law q_agg_view_maintain grades: the rollup stores
  * exact decimal partials, so group-level substitution is bit-identical.
  *
  * Deliberately conservative: the rewrite fires only when (a) the
  * aggregate's child is a bare (possibly column-pruned) scan of the
  * registered path — any Filter/Join means the rollup does not cover the
  * query; (b) the single grouping expression is the registered group
  * column; (c) EVERY aggregate function in the output is one of the two
  * registered shapes. Anything else passes through untouched. Attached
  * via `spark.experimental.extraOptimizations` ([[RollupRewrite.attach]])
  * so driver-owned sessions can opt in at runtime, or session-wide
  * through `GraftExtensions`.
  */
class RollupRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (RollupRewrite.registry.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _) =>
        RollupRewrite.registry.values.flatMap { spec =>
          tryRewrite(spec, agg, g, aggExprs, child)
        }.headOption.getOrElse(agg)
    }

  private def scansSource(plan: LogicalPlan, sourceDir: String): Boolean =
    plan match {
      case Project(projList, inner) if projList.forall(_.isInstanceOf[AttributeReference]) =>
        scansSource(inner, sourceDir)
      case rel: LogicalRelation =>
        rel.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.exists(_.toUri.getPath ==
              new org.apache.hadoop.fs.Path(sourceDir).toUri.getPath)
          case _ => false
        }
      case _ => false
    }

  private def tryRewrite(spec: RollupSpec, agg: Aggregate,
                         g: AttributeReference, aggExprs: Seq[NamedExpression],
                         child: LogicalPlan): Option[LogicalPlan] = {
    if (g.name != spec.groupCol || !scansSource(child, spec.sourceDir))
      return None

    // Every AggregateExpression in the output must be a registered shape.
    def shapeOf(ae: AggregateExpression): Option[String] =
      ae.aggregateFunction match {
        case Count(Seq(Literal(1, _))) if !ae.isDistinct => Some("count")
        case Count(Nil) if !ae.isDistinct => Some("count")
        case Sum(c: Cast, _) => c.child match {
          case a: AttributeReference
            if a.name == spec.valCol && c.dataType == DecimalType(38, 10) =>
            Some("sum")
          case _ => None
        }
        case _ => None
      }
    val allCovered = aggExprs.forall { ne =>
      ne.collect { case ae: AggregateExpression => ae }
        .forall(shapeOf(_).isDefined)
    }
    if (!allCovered) return None

    // Fresh rollup relation per rewrite (fresh exprIds — a shared plan
    // fragment would collide if the rule ever fired twice in one query).
    val rollup =
      try spark.read.parquet(spec.rollupDir).queryExecution.analyzed
      catch { case _: Throwable => return None }
    def attr(n: String): Option[Attribute] = rollup.output.find(_.name == n)
    val (segA, nA, sbA) =
      (attr(spec.groupOut), attr(spec.countOut), attr(spec.sumOut)) match {
        case (Some(a), Some(b), Some(c)) => (a, b, c)
        case _ => return None
      }

    def subst(e: Expression): Expression = e match {
      case ae: AggregateExpression => shapeOf(ae) match {
        case Some("count") => nA
        case Some("sum") => sbA
        case _ => ae // unreachable: allCovered checked above
      }
      case a: AttributeReference if a.semanticEquals(g) => segA
      case other => other.mapChildren(subst)
    }
    val projected = aggExprs.map {
      case a: Alias =>
        Alias(subst(a.child), a.name)(exprId = a.exprId, qualifier = a.qualifier)
      case attr: AttributeReference =>
        Alias(subst(attr), attr.name)(exprId = attr.exprId, qualifier = attr.qualifier)
      case other =>
        Alias(subst(other), other.name)(exprId = other.exprId)
    }
    Some(Project(projected, rollup))
  }
}

object RollupRewrite {
  private[plans] val registry =
    new scala.collection.concurrent.TrieMap[String, RollupSpec]()

  /** Register (or refresh) a maintained rollup for its source table. */
  def register(spec: RollupSpec): Unit = registry.put(spec.sourceDir, spec)

  def unregister(sourceDir: String): Unit = registry.remove(sourceDir)

  def clear(): Unit = registry.clear()

  /** Attach the rewrite to a session the library does not own (idempotent)
    * — the runtime twin of the `GraftExtensions` session-build injection. */
  def attach(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[RollupRewriteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new RollupRewriteRule(spark)
}
