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
  def callRegistered(
      name: String,
      builder: Seq[Expression] => Expression,
      session: Option[SparkSession],
      args: Column*): Column = {
    session.orElse(SparkSession.getActiveSession).foreach { s =>
      s.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    org.apache.spark.sql.functions.call_function(name, args: _*)
  }
}
