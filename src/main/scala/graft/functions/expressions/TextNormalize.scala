package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Text corpora mix composed ("é" U+00E9) and decomposed ("e" + U+0301)
  * encodings of the same visible string; every downstream text op —
  * fingerprinting, exact dedup, shingling, token counting — treats them
  * as different bytes unless the corpus is normalized first. NFC is the
  * canonical composition both Java (`java.text.Normalizer`) and DuckDB
  * (`nfc_normalize`) implement, which is what makes this oracle-checkable.
  *
  * A custom Expression (not a UDF): stays inside whole-stage codegen, no
  * encoder round-trip per row — normalization sits at the head of every
  * text pipeline, so it is hot by construction.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    // fast path: already-normalized text (the overwhelmingly common case)
    // skips the rebuild allocation
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.NfcNormalize.normalizeUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Called from generated code; mirrors nullSafeEval's fast path. */
  def normalizeUtf8(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  // weak set: a strong set would pin every session ever registered (see
  // VectorExpressions for the same idiom)
  private val registeredIn: java.util.Set[org.apache.spark.sql.SparkSession] =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]())

  def register(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    if (!registeredIn.contains(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")
      registeredIn.add(spark)
    }
  }

  /** Column-level entry point (registry + `call_function`, since Column's
    * expression constructor is sql-private in Spark 4).
    */
  def nfcNormalize(c: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession.foreach(register)
    org.apache.spark.sql.functions.call_function("nfc_normalize", c)
  }
}
