package graft

import graft.functions.expressions.{MinHashExpressions, MinHashSig, SimHash64, VecDot}
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
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    // SQL surface for the default MinHash configuration (64 perms, seed 42)
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => {
        val params = MinHashExpressions.hashParams(64, 42L)
        MinHashSig(exprs.head, params.map(_._1), params.map(_._2),
          MinHashExpressions.HashPrime)
      }))
  }
}
