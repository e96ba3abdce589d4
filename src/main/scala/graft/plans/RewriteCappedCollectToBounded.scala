package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, IsNotNull, LessThan, LessThanOrEqual, Literal, NamedExpression, Size, SortArray}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectSet}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, StringType}

/** Optimizer rule that makes the hot-bucket memory guard a LIBRARY
  * INVARIANT rather than a per-callsite discipline: the ubiquitous
  * hand-written capped-bucket pattern
  *
  * {{{
  *   df.groupBy(k).agg(collect_set(x).as("ids"))
  *     .filter(size($"ids") <= cap)          // or .between(lo, cap)
  * }}}
  *
  * applies the cap only AFTER one task has materialized the whole
  * array — a degenerate key builds an unbounded aggregation buffer and
  * OOMs the reducer the filter was meant to protect. This rule
  * rewrites it to [[BoundedCollectSet]], whose per-key buffer is
  * hard-bounded at cap+1 elements and whose over-cap keys ship a
  * one-byte tombstone; the size conjunct becomes `IsNotNull` (the
  * tombstone evaluates to NULL). Result-equivalent:
  *
  *   - keys at or under the cap produce the identical element SET
  *     (sorted — a valid instance of collect_set's unordered
  *     contract, and what every in-repo consumer sorts to anyway);
  *   - keys over the cap are dropped by both spellings;
  *   - remaining conjuncts (e.g. the `size >= 2` lower bound)
  *     evaluate identically on the surviving complete arrays.
  *
  * Fires only on the shapes where equivalence holds: a `collect_set`
  * (optionally wrapped in ascending `sort_array`) of a LONG or STRING
  * child — the [[BoundedCollectSet]] element types — with no FILTER
  * clause, whose output attribute is size-capped by a literal in the
  * Filter DIRECTLY above the Aggregate. `collect_list` is left alone
  * (its size counts duplicates; a set cap would change semantics).
  *
  * Register: `spark.experimental.extraOptimizations` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
object RewriteCappedCollectToBounded extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** `size(a) <= k` in any spelling → (a, k). */
  private def capOf(c: Expression): Option[(Attribute, Int)] = c match {
    case LessThanOrEqual(Size(a: Attribute, _), IntegerLiteral(k)) => Some((a, k))
    case LessThan(Size(a: Attribute, _), IntegerLiteral(k)) => Some((a, k - 1))
    case GreaterThanOrEqual(IntegerLiteral(k), Size(a: Attribute, _)) => Some((a, k))
    case GreaterThan(IntegerLiteral(k), Size(a: Attribute, _)) => Some((a, k - 1))
    case _ => None
  }

  /** The rewritable aggregate: collect_set of a supported type, no
    * FILTER clause, optionally under an ascending sort_array (which
    * the sorted bounded output makes redundant).
    */
  private def boundable(e: Expression): Option[Expression] = e match {
    case AggregateExpression(CollectSet(child, _, _), _, _, None, _)
        if child.dataType == LongType || child.dataType == StringType => Some(child)
    case SortArray(inner, Literal(true, _)) => boundable(inner)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, agg: Aggregate) =>
      // several cap conjuncts on one column (size<=8 AND size<=5) all
      // become IsNotNull below, so the aggregate must enforce the
      // TIGHTEST one — min, not last-wins
      val caps = conjuncts(cond).flatMap(capOf).filter(_._2 >= 1)
        .groupBy(_._1.exprId).map { case (id, ks) => id -> ks.map(_._2).min }
      var rewritten = Set.empty[org.apache.spark.sql.catalyst.expressions.ExprId]
      val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
        case al @ Alias(e, name) if caps.contains(al.exprId) =>
          boundable(e) match {
            case Some(child) =>
              rewritten += al.exprId
              // SAME exprId: the Filter's attribute references rebind
              Alias(BoundedCollectSet(child, caps(al.exprId)).toAggregateExpression(), name)(
                exprId = al.exprId, qualifier = al.qualifier,
                explicitMetadata = al.explicitMetadata)
            case None => al
          }
        case other => other
      }
      if (rewritten.isEmpty) f
      else {
        val newCond = conjuncts(cond).map { c =>
          capOf(c) match {
            case Some((a, _)) if rewritten.contains(a.exprId) =>
              // the attr instance must CLAIM nullability, or a later
              // optimizer pass folds IsNotNull(non-nullable) to true
              // and the tombstones leak through
              IsNotNull(a.withNullability(true))
            case _ => c
          }
        }.reduce(And)
        Filter(newCond, agg.copy(aggregateExpressions = newAggExprs))
      }
  }
}
