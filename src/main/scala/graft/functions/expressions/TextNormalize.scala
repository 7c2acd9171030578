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

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalizeUtf8(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.NfcNormalize.normalizeUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by nullSafeEval and generated code — one body, no drift.
    * ASCII fast path first: ASCII is trivially NFC and `numBytes ==
    * numChars` proves pure-ASCII without decoding, so the dominant case
    * allocates nothing; the isNormalized path still avoids the rebuild.
    */
  def normalizeUtf8(s: UTF8String): UTF8String = {
    if (s.numBytes() == s.numChars()) return s // pure ASCII
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    SessionFunctions.registerIfAbsent(spark,
      "nfc_normalize", exprs => NfcNormalize(exprs.head))

  /** Column-level entry point. Pass the session when you have one —
    * relying on the active-session thread-local fails on worker threads.
    */
  def nfcNormalize(c: Column,
      session: Option[org.apache.spark.sql.SparkSession] = None): Column =
    SessionFunctions.callRegistered("nfc_normalize",
      exprs => NfcNormalize(exprs.head), session, c)
}
