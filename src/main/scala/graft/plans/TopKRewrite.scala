package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, CurrentRow, Expression, IntegerLiteral, LessThan, LessThanOrEqual, Literal, NamedExpression, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule — the `Rule[LogicalPlan]` rung of the extension
  * ladder: rewrite the ubiquitous top-k window idiom
  *
  * {{{
  *   df.withColumn("rk", row_number().over(partitionBy(k*).orderBy(o*)))
  *     .filter($"rk" <= k).drop("rk")
  * }}}
  *
  * into [[TopKPerKeyNode]], so the user KEEPS writing the declarative
  * window form and the planner silently swaps in the partial/final
  * bounded-heap pair — no per-group full sort, map-side k-pruning
  * before the exchange. (Spark's own InferWindowGroupLimit only PRUNES
  * the window's input to k rows per key; the Window and its sort still
  * run. This rewrite removes them.)
  *
  * The match is deliberately narrow — all of the following must hold,
  * anything else is left untouched:
  *  - the Window computes EXACTLY ONE expression: row_number() over
  *    (ROWS UNBOUNDED PRECEDING .. CURRENT ROW), with a non-empty
  *    partition spec;
  *  - the filter is `rank <= lit` / `rank < lit` on that attribute
  *    (k derived accordingly) with k >= 1;
  *  - the parent Project references NOTHING produced by the Window
  *    (the rank column is dropped), so the node's child-output schema
  *    is sufficient.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private object RankFilter {
    /** (rankAttr, k) from `attr <= k` / `attr < k+1`. */
    def unapply(cond: Expression): Option[(Attribute, Int)] = cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) => Some((a, k))
      case LessThan(a: Attribute, IntegerLiteral(k)) => Some((a, k - 1))
      case LessThanOrEqual(a: Attribute, Literal(k: Long, _)) => Some((a, k.toInt))
      case LessThan(a: Attribute, Literal(k: Long, _)) => Some((a, k.toInt - 1))
      case _ => None
    }
  }

  private def isRowNumberOverRows(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(part, order,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _) =>
      part.nonEmpty && order.nonEmpty
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(RankFilter(rankAttr, k),
          w @ Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(part, order, _)), _)), _, _, child, _)))
        if k >= 1 &&
          isRowNumberOverRows(alias) &&
          rankAttr.exprId == alias.exprId &&
          projectList.forall(_.references.subsetOf(child.outputSet)) =>
      Project(projectList, TopKPerKeyNode(part, order, k, child))
  }
}
