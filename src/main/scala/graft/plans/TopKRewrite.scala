package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, CurrentRow, DenseRank, Expression, IntegerLiteral, LessThan, LessThanOrEqual, Literal, NamedExpression, Rank, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
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
  * — and (r11 verdict #3) its `rank()` / `dense_rank()` siblings, with
  * their tie semantics — into [[TopKPerKeyNode]], so the user KEEPS
  * writing the declarative window form and the planner silently swaps
  * in the partial/final bounded-retention pair — no per-group full
  * sort, map-side k-pruning before the exchange. (Spark's own
  * InferWindowGroupLimit only PRUNES the window's input per key; the
  * Window and its sort still run. This rewrite removes them.)
  *
  * The match is deliberately narrow — all of the following must hold,
  * anything else is left untouched:
  *  - the Window computes EXACTLY ONE expression: row_number() over
  *    (ROWS UNBOUNDED PRECEDING .. CURRENT ROW), or rank()/dense_rank()
  *    over (... UNBOUNDED PRECEDING .. CURRENT ROW — rank-like
  *    functions are frame-insensitive, so the frame type is not
  *    constrained), with a non-empty partition spec AND order spec;
  *  - the filter is `rank <= lit` / `rank < lit` on that attribute
  *    (k derived accordingly) with k >= 1;
  *  - the parent Project references NOTHING produced by the Window
  *    (the rank column is dropped), so the node's child-output schema
  *    is sufficient.
  *
  * OPT-IN ONLY: the rule fires only when
  * `spark.graft.topk.rewrite.enabled=true` (default FALSE). Tie caveat
  * (row_number only): row_number() over an ORDER BY with ties is
  * already nondeterministic in the Window form, but the heap pair can
  * return a DIFFERENT-but-equally-valid row set than the Window picked
  * — so silently enabling the rewrite could change observed results of
  * existing queries whose ordering is not total. Spark's own
  * WindowGroupLimit keeps the Window to preserve exact behavior; we
  * require the user to opt in instead (r11 ADVICE). The rank() and
  * dense_rank() rewrites are tie-INVARIANT (the emitted row set is the
  * same for any tie resolution), but they ride the same gate for one
  * consistent switch.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  /** Conf key gating the rewrite; unset/false = rule is a no-op. */
  val EnabledKey = "spark.graft.topk.rewrite.enabled"

  private object RankFilter {
    /** (rankAttr, k) from `attr <= k` / `attr < k+1`. Long arms are
      * bounds-guarded: an out-of-Int-range literal (e.g. rk <=
      * 4294967297L) must NOT truncate to a tiny k and silently rewrite
      * to top-1 (r11 ADVICE) — likely unreachable today (rank functions
      * are IntegerType, so coercion wraps the attribute in a Cast that
      * defeats the `a: Attribute` match), but the guard is free.
      */
    def unapply(cond: Expression): Option[(Attribute, Int)] = cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) => Some((a, k))
      case LessThan(a: Attribute, IntegerLiteral(k)) => Some((a, k - 1))
      case LessThanOrEqual(a: Attribute, Literal(k: Long, _))
          if k >= 1 && k <= Int.MaxValue => Some((a, k.toInt))
      case LessThan(a: Attribute, Literal(k: Long, _))
          if k >= 2 && k <= Int.MaxValue => Some((a, k.toInt - 1))
      case _ => None
    }
  }

  /** The operator mode for a supported rank-like window expression, or
    * None when the shape is out of contract. row_number is
    * frame-SENSITIVE (must be ROWS UNBOUNDED PRECEDING..CURRENT ROW —
    * the only frame under which it means "position"); rank/dense_rank
    * ignore their frame entirely (Spark plans them with a default
    * RANGE frame), so only the boundaries are pinned.
    */
  private def modeOf(e: NamedExpression): Option[TopKMode] = e match {
    case Alias(WindowExpression(fn,
        WindowSpecDefinition(part, order,
          SpecifiedWindowFrame(frameType, UnboundedPreceding, CurrentRow))), _)
        if part.nonEmpty && order.nonEmpty =>
      fn match {
        case RowNumber() if frameType == RowFrame => Some(RowNumberMode)
        case _: Rank                              => Some(RankMode)
        case _: DenseRank                         => Some(DenseRankMode)
        case _                                    => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "false").toBoolean) plan
    else plan.transformUp {
    case p @ Project(projectList,
        Filter(RankFilter(rankAttr, k),
          w @ Window(Seq(alias @ Alias(WindowExpression(_,
            WindowSpecDefinition(part, order, _)), _)), _, _, child, _)))
        if k >= 1 &&
          modeOf(alias).isDefined &&
          rankAttr.exprId == alias.exprId &&
          projectList.forall(_.references.subsetOf(child.outputSet)) =>
      Project(projectList, TopKPerKeyNode(part, order, k, child, modeOf(alias).get))
  }
}
