package graft

import graft.functions.expressions.VecDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension hook registering the engine's native expressions at
  * session build time — the deployment-grade alternative to per-session
  * temp-function registration:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)           // in-process
  * // or, via config (spark-submit):
  * //   --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
  }
}
