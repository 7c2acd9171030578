package graft.functions.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** The one registry+`call_function` route every native expression's Column
  * entry point uses (Column's Expression constructor is sql-private in
  * Spark 4, so the registry is the public path).
  *
  * `createOrReplaceTempFunction` is idempotent and runs at query-build
  * time only, so no registration cache is kept. Callers should pass the
  * session explicitly when they have one: `getActiveSession` is a
  * thread-local and is unset on bare worker threads, which would
  * silently skip registration and fail analysis with UNRESOLVED_ROUTINE.
  */
object SessionFunctions {

  /** Register `name` only if the session's registry doesn't already have
    * it. Every graft function name fully encodes its builder parameters
    * (`minhash_sig_<n>_<seed>`, `bloom_agg_<n>`, `vec_dot`, ...), so an
    * existing entry IS the same function and re-registering it would only
    * produce SimpleFunctionRegistry's "replaced a previously registered
    * function" WARN — hundreds per suite run, burying real WARNs.
    */
  def registerIfAbsent(
      s: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val registry = s.sessionState.functionRegistry
    if (!registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name))) {
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  def callRegistered(
      name: String,
      builder: Seq[Expression] => Expression,
      session: Option[SparkSession],
      args: Column*): Column = {
    val s = session.orElse(SparkSession.getActiveSession).getOrElse(
      // fail HERE, at the call site, not later as an opaque
      // UNRESOLVED_ROUTINE analysis error at call_function time
      throw new IllegalStateException(
        s"no SparkSession available to register '$name': pass the session " +
          "explicitly (getActiveSession is a thread-local, unset on bare " +
          "worker threads)"))
    registerIfAbsent(s, name, builder)
    org.apache.spark.sql.functions.call_function(name, args: _*)
  }
}
