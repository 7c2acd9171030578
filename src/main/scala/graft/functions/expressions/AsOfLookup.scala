package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StructType}

import scala.collection.immutable.ArraySeq

/** Driver-built as-of index over a SMALL right side: per key, the right
  * rows sorted by timestamp (ascending), timestamps pre-extracted into a
  * primitive long[] for the binary search. Built once on the driver by
  * [[graft.ops.AsOfJoin.asofBroadcast]], shipped to every executor in ONE
  * broadcast — the probe side then needs NO exchange at all.
  *
  * The payload rows are driver-materialized [[InternalRow]]s (catalyst
  * values), so the probing expression can return them directly as its
  * struct value without any conversion on the hot path.
  */
final class AsOfIndex(val groups: Map[Seq[Any], AsOfIndex.KeyGroup])
    extends Serializable {

  /** Latest row with ts <= t (backward), earliest with ts >= t
    * (forward), or the closer of the two (nearest; equidistant → the
    * backward one) for `key`; null when the key is absent or no row
    * qualifies within the tolerance. Among equal timestamps the
    * build-side sort order decides: backward returns the LAST of the
    * run, forward the FIRST — the [[graft.plans.AsOfMergeJoin]] tie
    * conventions. `direction` is 'b' | 'f' | 'n'.
    */
  def lookup(key: Seq[Any], ts: Long, direction: Char,
      toleranceMicros: Long = Long.MaxValue): InternalRow =
    groups.get(key) match {
      case None => null
      case Some(g) =>
        if (direction == 'n') {
          val b = AsOfIndex.lastAtMost(g.ts, ts)
          val f = AsOfIndex.firstAtLeast(g.ts, ts)
          val db = if (b >= 0) ts - g.ts(b) else Long.MaxValue
          val df = if (f >= 0) g.ts(f) - ts else Long.MaxValue
          val bOk = b >= 0 && db <= toleranceMicros
          val fOk = f >= 0 && df <= toleranceMicros
          if (!bOk && !fOk) null
          else if (!fOk || (bOk && db <= df)) g.rows(b) // tie → backward
          else g.rows(f)
        } else {
          val fwd = direction == 'f'
          val i = if (fwd) AsOfIndex.firstAtLeast(g.ts, ts)
                  else AsOfIndex.lastAtMost(g.ts, ts)
          if (i < 0) null
          else {
            val age = if (fwd) g.ts(i) - ts else ts - g.ts(i)
            if (age > toleranceMicros) null else g.rows(i)
          }
        }
    }
}

object AsOfIndex {
  /** One key's right rows: parallel arrays, ts ascending. */
  final case class KeyGroup(ts: Array[Long], rows: Array[InternalRow])

  /** Greatest index with a(i) <= t, or -1. `a` ascending. */
  def lastAtMost(a: Array[Long], t: Long): Int = {
    var lo = 0; var hi = a.length - 1; var ans = -1
    while (lo <= hi) {
      val m = (lo + hi) >>> 1
      if (a(m) <= t) { ans = m; lo = m + 1 } else hi = m - 1
    }
    ans
  }

  /** Least index with a(i) >= t, or -1. `a` ascending. */
  def firstAtLeast(a: Array[Long], t: Long): Int = {
    var lo = 0; var hi = a.length - 1; var ans = -1
    while (lo <= hi) {
      val m = (lo + hi) >>> 1
      if (a(m) >= t) { ans = m; hi = m - 1 } else lo = m + 1
    }
    ans
  }
}

/** Native probe expression for the broadcast as-of join: children are
  * (key exprs..., ts expr); the value is the matched right payload as a
  * struct (asof_ts, carried cols...), or null when any input is null or
  * no right row qualifies.
  *
  * Why an Expression and not a UDF: the probe stays INSIDE whole-stage
  * codegen (the generated code boxes the key, calls [[probe]], and the
  * surrounding project keeps its single codegen span), there is no
  * external<->catalyst conversion anywhere (the index already stores
  * catalyst rows), and null semantics are explicit rather than
  * Option-encoded. The per-row cost is one hash probe + one binary
  * search over a primitive long[] — O(log rows_per_key) with zero
  * allocation beyond the boxed key.
  */
case class AsOfLookup(
    children: Seq[Expression],
    index: Broadcast[AsOfIndex],
    payloadSchema: StructType,
    direction: String,
    toleranceMicros: Option[Long] = None) extends Expression {

  require(children.length >= 2, "AsOfLookup needs at least (key, ts)")
  require(Seq("backward", "forward", "nearest").contains(direction),
    s"direction must be backward|forward|nearest, got '$direction'")
  private val dirChar: Char = direction.charAt(0) // 'b' | 'f' | 'n'

  override def dataType: DataType = payloadSchema
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val m = children.length
    val args = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      val v = children(i).eval(input)
      if (v == null) return null // null key/ts matches nothing
      args(i) = v.asInstanceOf[AnyRef]
      i += 1
    }
    probe(args)
  }

  /** Shared by eval and the generated code. Any null arg → null row.
    * The last arg is the timestamp, long-backed by the wrapper's type
    * check (timestamp/date/integral).
    */
  def probe(args: Array[AnyRef]): InternalRow = {
    var i = 0
    while (i < args.length) {
      if (args(i) == null) return null
      i += 1
    }
    val ts = args(args.length - 1).asInstanceOf[java.lang.Number].longValue()
    val key: Seq[Any] = ArraySeq.unsafeWrapArray(
      java.util.Arrays.copyOfRange(args, 0, args.length - 1))
    index.value.lookup(key, ts, dirChar,
      toleranceMicros.getOrElse(Long.MaxValue))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("asofLookup", this, classOf[AsOfLookup].getName)
    val args = ctx.freshName("asofArgs")
    val evals = children.zipWithIndex.map { case (c, i) =>
      val e = c.genCode(ctx)
      val boxed =
        if (CodeGenerator.isPrimitiveType(c.dataType))
          s"${CodeGenerator.boxedType(c.dataType)}.valueOf(${e.value})"
        else s"${e.value}"
      s"""
         |${e.code}
         |if (!${e.isNull}) { $args[$i] = $boxed; }
       """.stripMargin
    }.mkString("\n")
    val row = ctx.freshName("asofRow")
    ev.copy(code =
      code"""
        |Object[] $args = new Object[${children.length}];
        |$evals
        |InternalRow $row = $self.probe($args);
        |boolean ${ev.isNull} = ($row == null);
        |InternalRow ${ev.value} = $row;
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AsOfLookup =
    copy(children = newChildren)

  override def prettyName: String = "asof_lookup"
}
