package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, Dataset, SparkSession => ClassicSparkSession}

/** The one `private[sql]` door the custom-operator layer needs: wrap a
  * hand-built [[LogicalPlan]] into a DataFrame. Lives in the
  * `org.apache.spark.sql` package BY DESIGN — this is the standard
  * extension-library idiom (Delta, Iceberg and Sedona all ship exactly
  * this bridge) and keeps every other graft source outside Spark's
  * package namespace.
  */
object GraftInternal {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Column -> Catalyst expression (Spark 4 moved the old `Column.expr`
    * behind the classic converter). NOTE: `ExpressionUtils.expression`
    * returns a LAZY `ColumnNodeExpression` wrapper that only standard
    * Dataset operators unwrap — inside a custom LogicalPlan it survives
    * to execution and dies with `Cannot evaluate expression` (measured).
    * The eager node converter yields the plain catalyst form
    * (`UnresolvedAttribute` etc.) that the generic analyzer rules
    * resolve in ANY operator.
    */
  def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
