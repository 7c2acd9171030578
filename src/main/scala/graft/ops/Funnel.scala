package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequential conversion funnel — the product-analytics staple over an
  * event stream: how many users reached step 1, then step 2 AT OR AFTER
  * their step-1 time (optionally within a max span), then step 3 after
  * that, and so on.
  *
  * Each step is one user-keyed aggregation (earliest qualifying event
  * time) feeding a user-keyed join with the next step's events — k steps
  * = k aggregations + k-1 equi-joins, all hashed on the user id, nothing
  * on the driver. The per-user state is ONE timestamp per step (the
  * earliest-reach frontier), which is exactly what a streaming
  * re-formulation would keep in its state store.
  */
object Funnel {

  /** Per-step reach counts: (step 1-based long, event_type, n_users).
    *
    * A user counts for step i if they have a step-i event at-or-after
    * their EARLIEST step-(i-1) reach time (and within `maxSpan` of it,
    * when given — e.g. "INTERVAL 7 DAYS"). Earliest-reach is the standard
    * greedy frontier: it maximizes the time remaining for later steps
    * under a span cap.
    */
  /** One frame per step: (user, __t = earliest reach time) — the shared
    * frontier recursion behind both public forms.
    */
  private def reachFrontiers(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxSpan: Option[String]): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel with zero steps")
    require(steps.distinct.size == steps.size, s"duplicate step in $steps")
    def earliest(df: DataFrame): DataFrame =
      df.groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    val first = earliest(events.filter(col(typeCol) === steps.head))
    steps.tail.scanLeft(first) { (prev, step) =>
      val candidates = events.filter(col(typeCol) === step)
        .join(prev.select(col(userCol), col("__t").as("__prev_t")), Seq(userCol))
        .filter(col(tsCol) >= col("__prev_t"))
      val capped = maxSpan match {
        case Some(span) => candidates.filter(col(tsCol) <= col("__prev_t") + expr(span))
        case None       => candidates
      }
      earliest(capped)
    }
  }

  def funnelSteps(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxSpan: Option[String] = None): DataFrame =
    reachFrontiers(events, userCol, tsCol, typeCol, steps, maxSpan)
      .zip(steps).zipWithIndex.map { case ((df, step), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1L).as("step"), lit(step).as("event_type"),
            col("n_users"))
      }.reduce(_.unionAll(_))

  /** Per-user step-reach times in wide format — (user, t_step1, ...,
    * t_stepK nullable) — for downstream time-to-convert analysis.
    */
  def funnelTimes(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxSpan: Option[String] = None): DataFrame =
    reachFrontiers(events, userCol, tsCol, typeCol, steps, maxSpan)
      .zip(steps).map { case (df, step) =>
        df.select(col(userCol), col("__t").as(s"t_$step"))
      }.reduce((a, b) => a.join(b, Seq(userCol), "left"))
}
