package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) per group — "the cheapest part at every
  * size", "the fastest config at every cost": rows not strictly dominated
  * by any other row of the same group on (x, y), both minimized.
  *
  * The naive definition is an O(n^2) self-join; the sorted formulation is
  * one window pass: order by (x asc, y asc, tie), keep a row iff its y is
  * strictly below the running minimum of all PRECEDING rows. Every
  * preceding row has smaller-or-equal x, so "y >= min of preceding ys"
  * is exactly "dominated" — O(n log n), one hash exchange on the group
  * key, no join. Exact (x, y) duplicates collapse to the first by the
  * tie column (neither strictly dominates the other; keeping one
  * representative is the useful semantics and both engines share it).
  */
object Pareto {

  def frontier2d(df: DataFrame, groupCols: Seq[String], x: String,
      y: String, tie: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(x).asc, col(y).asc, col(tie).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // Rows with NULL x or y are incomparable under dominance — they are
    // excluded, never frontier members and never dominators (a NULL-x
    // row would otherwise sort NULLS FIRST and poison the running min).
    df.filter(col(x).isNotNull && col(y).isNotNull)
      .withColumn("__min_y", min(col(y)).over(w))
      .filter(col("__min_y").isNull || col(y) < col("__min_y"))
      .drop("__min_y")
  }
}
