package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level Aho-Corasick automaton over a fixed pattern set: ONE pass
  * over the text counts every (overlapping) occurrence of every pattern
  * simultaneously — the multi-pattern scanning core of blocklist /
  * PII / contamination sweeps. Built once per expression instance
  * (driver), shipped in the codegen reference object; match time is one
  * dense-DFA array lookup per input byte plus the emit counts.
  *
  * Byte-level matching over UTF-8 is exact for occurrence COUNTING even
  * on multi-byte text: UTF-8 is self-synchronizing, so a pattern's byte
  * sequence occurs exactly where its character sequence does.
  */
final class AhoCorasick(patterns: Seq[Array[Byte]]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty")

  // trie build: nodes bounded by total pattern bytes + 1
  private val maxNodes = patterns.map(_.length).sum + 1
  private val goto_ = Array.fill(maxNodes)(null: Array[Int])
  private val ends = Array.fill(maxNodes)(List.empty[Int])
  private var nNodes = 1
  goto_(0) = Array.fill(256)(-1)
  patterns.zipWithIndex.foreach { case (p, pi) =>
    var s = 0
    p.foreach { b =>
      val c = b & 0xFF
      if (goto_(s)(c) == -1) {
        goto_(nNodes) = Array.fill(256)(-1)
        goto_(s)(c) = nNodes
        nNodes += 1
      }
      s = goto_(s)(c)
    }
    ends(s) ::= pi
  }
  // BFS failure links; complete the goto table into a dense DFA and
  // flatten the emit sets (own ends ++ emits inherited via fail links)
  private val fail = new Array[Int](nNodes)
  private val emits = new Array[Array[Int]](nNodes)
  locally {
    val queue = scala.collection.mutable.Queue.empty[Int]
    emits(0) = ends(0).toArray
    (0 until 256).foreach { c =>
      val nxt = goto_(0)(c)
      if (nxt == -1) goto_(0)(c) = 0
      else { fail(nxt) = 0; queue += nxt }
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      emits(s) = (ends(s) ++ emits(fail(s))).toArray
      (0 until 256).foreach { c =>
        val nxt = goto_(s)(c)
        if (nxt == -1) goto_(s)(c) = goto_(fail(s))(c)
        else { fail(nxt) = goto_(fail(s))(c); queue += nxt }
      }
    }
  }

  val numPatterns: Int = patterns.length
  private val patLens: Array[Int] = patterns.map(_.length).toArray

  /** Per-pattern overlapping occurrence counts in one pass. */
  def countAll(bytes: Array[Byte]): Array[Long] = {
    val counts = new Array[Long](numPatterns)
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = goto_(s)(bytes(i) & 0xFF)
      val e = emits(s)
      if (e.length > 0) {
        var j = 0
        while (j < e.length) { counts(e(j)) += 1L; j += 1 }
      }
      i += 1
    }
    counts
  }

  /** Bytes NOT covered by any occurrence of any pattern — interval-union
    * redaction (well-defined under arbitrary overlaps, unlike
    * replace-style leftmost rules). One matching pass marks covered
    * bytes (work bounded by matches x pattern length), one pass
    * compacts. ASCII patterns can never split a multi-byte character:
    * every covered byte is a pattern byte.
    */
  def redact(bytes: Array[Byte]): Array[Byte] = {
    val covered = new Array[Boolean](bytes.length)
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = goto_(s)(bytes(i) & 0xFF)
      val e = emits(s)
      var j = 0
      while (j < e.length) {
        var k = i - patLens(e(j)) + 1
        while (k <= i) { covered(k) = true; k += 1 }
        j += 1
      }
      i += 1
    }
    var n = 0
    i = 0
    while (i < bytes.length) { if (!covered(i)) n += 1; i += 1 }
    if (n == bytes.length) bytes
    else {
      val out = new Array[Byte](n)
      var o = 0
      i = 0
      while (i < bytes.length) {
        if (!covered(i)) { out(o) = bytes(i); o += 1 }
        i += 1
      }
      out
    }
  }
}

/** Counts of every pattern in a fixed blocklist, per row, in ONE text
  * pass: value is array<bigint> aligned with the pattern list (null
  * text → null). The N-regex / N-contains alternative scans the text N
  * times and the higher-order-function form interprets a lambda per
  * position x pattern — this is the (b) rung of the extension ladder
  * (native Expression beats HOF beats UDF), with the automaton in a
  * codegen reference object so the scan stays inside whole-stage
  * codegen.
  */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "pattern list must be non-empty")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multi_pattern_count requires string, got ${other.simpleString}")
  }

  @transient private lazy val ac =
    new AhoCorasick(patterns.map(_.getBytes("UTF-8")))

  /** Shared by eval and the generated code. */
  def count(u: UTF8String): UnsafeArrayData =
    UnsafeArrayData.fromPrimitiveArray(ac.countAll(u.getBytes))

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("multiPattern", this,
      classOf[MultiPatternCount].getName)
    nullSafeCodeGen(ctx, ev, u => s"${ev.value} = $ref.count($u);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCount =
    copy(child = newChild)

  override def prettyName: String = "multi_pattern_count"
}

/** Text with every byte covered by ANY pattern occurrence removed — the
  * APPLY sibling of [[MultiPatternCount]] (scan counts, this excises):
  * blocklist redaction in the same single automaton pass. Interval-UNION
  * semantics: overlapping and nested matches excise their union, which
  * is order-independent and therefore oracle-replayable (a leftmost
  * replace rule would depend on pattern priority).
  */
case class MultiPatternRedact(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "pattern list must be non-empty")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multi_pattern_redact requires string, got ${other.simpleString}")
  }

  @transient private lazy val ac =
    new AhoCorasick(patterns.map(_.getBytes("UTF-8")))

  def redact(u: UTF8String): UTF8String =
    UTF8String.fromBytes(ac.redact(u.getBytes))

  override def nullSafeEval(input: Any): Any =
    redact(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("multiPatternRedact", this,
      classOf[MultiPatternRedact].getName)
    nullSafeCodeGen(ctx, ev, u => s"${ev.value} = $ref.redact($u);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternRedact =
    copy(child = newChild)

  override def prettyName: String = "multi_pattern_redact"
}

object MultiPattern {
  private val fnCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Column form (function-registry route — Column's Expression
    * constructor is sql-private in Spark 4, the MinHashSig precedent).
    * One registry entry per call site, bounded by call count.
    */
  def counts(text: Column, patterns: Seq[String],
      session: Option[org.apache.spark.sql.SparkSession] = None): Column =
    SessionFunctions.callRegistered(
      s"multi_pattern_count_${fnCounter.incrementAndGet()}",
      exprs => MultiPatternCount(exprs.head, patterns), session, text)

  /** Column form of [[MultiPatternRedact]]. */
  def redact(text: Column, patterns: Seq[String],
      session: Option[org.apache.spark.sql.SparkSession] = None): Column =
    SessionFunctions.callRegistered(
      s"multi_pattern_redact_${fnCounter.incrementAndGet()}",
      exprs => MultiPatternRedact(exprs.head, patterns), session, text)
}
