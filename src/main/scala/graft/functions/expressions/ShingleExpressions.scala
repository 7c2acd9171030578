package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass masked shingle hashes from a token array: for every k-token
  * window, hash the space-joined window with xxhash64 (seed 42 — Spark's
  * default), mask to 32 bits, and emit the DISTINCT hashes in first-seen
  * order.
  *
  * Replaces the interpreted chain `array_distinct(transform(shingles(k),
  * xxhash64)) → mask`, whose per-shingle lambda dispatch (slice +
  * array_join + hash as separate interpreted expressions) dominated the
  * text pipeline. This is a `CodegenFallback` (string building doesn't
  * lower to a simple codegen template), but the whole row is one tight
  * JVM loop instead of 4 interpreted passes.
  *
  * Semantics mirror the higher-order form exactly: fewer than k tokens
  * degrade to ONE whole-text shingle; null tokens are skipped inside a
  * window the way `array_join` skips them; a null input array is null.
  */
case class ShingleHashes32(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"shingle size must be positive: $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${other.simpleString}")
  }

  private def windowHash(tokens: ArrayData, start: Int, len: Int): Long =
    ShingleHashing.windowHash(tokens, start, len)

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val n = tokens.numElements()
    // the higher-order form dedupes on the UNMASKED 64-bit hash and masks
    // afterwards — a mask-collision of two distinct hashes must survive as
    // a duplicate masked value to stay bit-compatible
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (n < k) seen.add(windowHash(tokens, 0, n))
    else {
      var i = 0
      while (i <= n - k) {
        seen.add(windowHash(tokens, i, k))
        i += 1
      }
    }
    val arr = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next() & 0xFFFFFFFFL; j += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes32 =
    copy(child = newChild)
}

/** POSITIONAL window hashes: for every k-token window, the full 64-bit
  * xxhash64 (seed 42) of the space-joined window, emitted IN POSITION
  * ORDER with no dedup — element i is the hash of the window starting at
  * token i, so `posexplode` recovers (position, hash) pairs directly.
  * This is the [[graft.ops.ExactSubstr]] primitive: the Lee et al. 2022
  * exact-substring dedup needs every window OCCURRENCE (a repeated
  * >=L-token substring is exactly a run of repeated L-windows), where
  * [[ShingleHashes32]]'s first-seen dedup + 32-bit mask serve MinHash
  * set semantics instead.
  *
  * Unlike the shingle form, fewer than k tokens yield an EMPTY array
  * (no window of length k exists — degrading to a whole-text hash would
  * fabricate a short "duplicate" the substring semantics exclude).
  * A null input array is null; null tokens inside a window are skipped
  * the way `array_join` skips them.
  */
case class WindowHashes64(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"window size must be positive: $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_hashes requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val n = tokens.numElements()
    if (n < k) new GenericArrayData(Array.empty[Long])
    else {
      val arr = new Array[Long](n - k + 1)
      var i = 0
      while (i <= n - k) {
        arr(i) = ShingleHashing.windowHash(tokens, i, k)
        i += 1
      }
      new GenericArrayData(arr)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WindowHashes64 =
    copy(child = newChild)
}

private[expressions] object ShingleHashing {
  private val space = UTF8String.fromString(" ")

  /** xxhash64 (seed 42) of the space-joined window, `array_join`
    * semantics for nulls — shared by [[ShingleHashes32]] and
    * [[WindowHashes64]] so the two surfaces cannot drift.
    */
  def windowHash(tokens: ArrayData, start: Int, len: Int): Long = {
    val parts = new java.util.ArrayList[UTF8String](len)
    var i = start
    while (i < start + len) {
      if (!tokens.isNullAt(i)) parts.add(tokens.getUTF8String(i))
      i += 1
    }
    val joined = UTF8String.concatWs(space, parts.toArray(new Array[UTF8String](parts.size())): _*)
    XxHash64Function.hash(joined, StringType, 42L)
  }
}

object ShingleExpressions {

  /** Column form: distinct masked 32-bit shingle hashes of a token array
    * (registry route — Column's Expression constructor is sql-private).
    */
  def shingleHashes32(tokens: Column, k: Int): Column =
    SessionFunctions.callRegistered(s"shingle_hashes32_$k",
      exprs => ShingleHashes32(exprs.head, k), None, tokens)

  /** Column form: positional 64-bit window hashes (one per k-window,
    * position order, no dedup) — see [[WindowHashes64]].
    */
  def windowHashes64(tokens: Column, k: Int): Column =
    SessionFunctions.callRegistered(s"window_hashes64_$k",
      exprs => WindowHashes64(exprs.head, k), None, tokens)
}
