package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rules for the custom [[AsOfJoin]] node. A custom logical
  * operator is OPAQUE to Catalyst's built-in pushdown/pruning — Filter
  * stays stacked above it and ColumnPruning cannot see which right-side
  * columns the merge actually consumes — so the operator ships with the
  * two rules that restore exactly those optimizations. Registered beside
  * the strategy (runtime `extraOptimizations` in [[graft.ops.AsOf]],
  * `injectOptimizerRule` in GraftExtensions). Both rules reach a fixed
  * point: the pushed filter's remainder references right-side payload
  * only, and the inserted Project makes the prune test a no-op on the
  * next pass.
  */
object AsOfJoinRules {

  /** Predicates over only-left attributes commute with the as-of join:
    * matching is per-left-row (dropping left rows cannot change any
    * other row's payload), so they filter the left child directly —
    * from where the standard rules push them all the way into the scan.
    */
  object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, aj: AsOfJoin) =>
        val (pushable, kept) = splitConjunctivePredicates(cond)
          .partition(_.references.subsetOf(aj.left.outputSet))
        if (pushable.isEmpty) f
        else {
          val pushed = aj.copy(left = Filter(pushable.reduce(And), aj.left))
          kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
        }
    }
  }

  /** The merge consumes only (rightKeys, rightTime, payload) from the
    * right side — project the right child down to them so the standard
    * ColumnPruning can carry the narrowing into the scan's ReadSchema.
    */
  object PruneAsOfJoinRight extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case aj: AsOfJoin =>
        val needed = AttributeSet(
          aj.rightKeys ++ Seq(aj.rightTime) ++ aj.payload ++ aj.rightTiebreak)
        if (aj.right.output.forall(needed.contains)) aj
        else aj.copy(right =
          Project(aj.right.output.filter(needed.contains), aj.right))
    }
  }
}
