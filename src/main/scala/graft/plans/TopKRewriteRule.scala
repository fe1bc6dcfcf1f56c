package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous window-rank top-k idiom
  *
  * {{{
  *   Project(cols not using rn,
  *     Filter(rn <= k,
  *       Window([row_number() over (partition by keys order by o) rn],
  *              keys, o, child)))
  * }}}
  *
  * into the engine's sort-free [[TopKPerKey]] operator. The window
  * form hash-shuffles AND fully sorts every partition to compute a
  * rank that the filter immediately throws away for all but k rows;
  * the rewrite keeps the shuffle and replaces the sort with a bounded
  * heap (see [[TopKPerKeyExec]]).
  *
  * Guards (rewrite only when provably equivalent):
  *   - the Window computes exactly ONE expression: row_number with the
  *     default (UnboundedPreceding, CurrentRow) row frame and a
  *     non-empty partition spec (the global case is already planned as
  *     TakeOrderedAndProject by Spark);
  *   - the Filter is exactly `rn <= lit` / `rn < lit` / `rn = 1`;
  *   - the Project above references only child columns — the rank
  *     value itself must be dead after the filter.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private object RankLimit {
    /** Extract k from the supported comparison shapes. */
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) => Some((a, k))
      case LessThan(a: Attribute, Literal(k: Int, _)) => Some((a, k - 1))
      case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) => Some((a, k))
      case GreaterThan(Literal(k: Int, _), a: Attribute) => Some((a, k - 1))
      case EqualTo(a: Attribute, Literal(1, _)) => Some((a, 1))
      case EqualTo(Literal(1, _), a: Attribute) => Some((a, 1))
      case _ => None
    }
  }

  private def isRowNumberWindow(e: NamedExpression): Option[Seq[Expression]] =
    e match {
      case Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(partitionSpec, _,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
          _) if partitionSpec.nonEmpty =>
        Some(partitionSpec)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(RankLimit(rnAttr, k),
          w @ Window(Seq(winExpr), partitionSpec, orderSpec, child, _)))
        if k >= 1 &&
          winExpr.toAttribute.semanticEquals(rnAttr) &&
          isRowNumberWindow(winExpr).isDefined &&
          p.references.subsetOf(child.outputSet) =>
      Project(projectList, TopKPerKey(partitionSpec, orderSpec, k, child))
  }
}
