package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftInternal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, Descending, Expression, InterpretedOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension — the (c) rung of the extension
  * ladder (compose > Expression > LogicalPlan+Strategy+SparkPlan >
  * mapPartitions): per-key top-k as a FIRST-CLASS operator instead of
  * the `row_number() OVER (...) <= k` window idiom.
  *
  * Why a custom operator earns its keep here: the window form sorts
  * every group in full (k ignored until the filter), while this plans
  * like a partial aggregation — a map-side bounded-heap pass per
  * partition (each emits <= k rows per key it sees), ONE hash exchange
  * on the keys, and a final bounded-heap pass. Per-task state is
  * O(keys-in-partition x k) rows; nothing ever materializes a full
  * per-key sort. The planner sees [[TopKPerKeyNode]]; the strategy
  * lowers it to the partial/final [[TopKPerKeyExec]] pair and
  * EnsureRequirements inserts the exchange the final's required
  * distribution declares — exactly how HashAggregateExec splits.
  *
  * Correctness contract: `order` must be a TOTAL order on the rows of
  * each key (tie-break every ordering column, e.g. end with a unique
  * id) — the same requirement every deterministic row_number carries.
  *
  * Reference framing: the reference engine's per-station "latest k
  * measurements" reads (OpenAQ-Data-Pipeline-Engineering
  * `athena_queries.sql` top-N-per-group shapes) are this operator; the
  * catalog's q335 oracle-pairs it against the window form.
  */
object TopKPerKey {

  /** Per-key top-k of `df`: the rows whose rank under `orderCols`
    * (column, ascending?) within their `keyCols` group is <= k.
    * Registers the planner strategy on the session idempotently —
    * [[graft.GraftExtensions]] injects the same strategy for
    * config-driven deployments.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[Column],
      orderCols: Seq[(Column, Boolean)], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(keyCols.nonEmpty && orderCols.nonEmpty, "keys and order required")
    val spark = df.sparkSession
    // synchronized: extraStrategies is a read-modify-write of a plain
    // var — concurrent callers on the same session could lose or double
    // an append (r11 ADVICE)
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKPerKeyStrategy
      }
    }
    val order = orderCols.map { case (c, asc) =>
      SortOrder(GraftInternal.expr(c), if (asc) Ascending else Descending)
    }
    GraftInternal.ofRows(spark,
      TopKPerKeyNode(keyCols.map(GraftInternal.expr), order, k,
        df.queryExecution.analyzed))
  }
}

/** Logical form: declarative per-key top-k. Output = child output (a
  * filter-like operator). Resolution rides the generic analyzer rules —
  * the node exposes its expressions through the constructor, so
  * `ResolveReferences` binds them like any stock operator's.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Planner strategy: lower the logical node to the partial/final
  * physical pair (the HashAggregate split, applied to top-k).
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Physical per-key top-k with a different memory story per phase —
  * the 100 TB shape of the operator:
  *
  *  - PARTIAL (map side, no distribution requirement): per-key bounded
  *    heaps, state O(keys-in-partition x k). High-cardinality keys could
  *    still blow that bound, so a FLUSH VALVE caps live state on TWO
  *    axes (r11 ADVICE: a key-count cap alone lets wide rows or large k
  *    OOM long before 1M keys): `spark.graft.topk.maxKeysInFlight`
  *    (default 1M) live heaps AND `spark.graft.topk.maxBytesInFlight`
  *    (default 256 MiB) of retained UnsafeRow bytes, tracked exactly
  *    from `getSizeInBytes` of every copied key/sort-key/row as entries
  *    enter and leave the heaps. Past either cap the phase emits
  *    everything held and starts fresh — emitting extra candidate rows
  *    is always CORRECT here (the final phase re-prunes), so memory
  *    degrades gracefully into shuffle volume instead of OOM.
  *  - FINAL: requires [[ClusteredDistribution]] on the keys AND
  *    child ordering (keys, then the top-k order) — EnsureRequirements
  *    inserts the hash exchange and a sort of the ALREADY k-PRUNED
  *    stream — then emits the first k rows of each key group with O(1)
  *    state (the SortAggregate pattern; a hash-of-heaps final could not
  *    flush without double-emitting a key, so it would carry the same
  *    unbounded-keys hazard HashAggregate has).
  *
  * Heap/stream comparisons use the interpreted row ordering — the
  * operator is deliberately outside whole-stage codegen (it carries
  * group state, the same reason ObjectHashAggregate opts out); the
  * EXPRESSIONS feeding it still codegen in the child stage.
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(keys.map(SortOrder(_, Ascending)) ++ order)
  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else keys.map(SortOrder(_, Ascending)) ++ order
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  protected override def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrders = order
    val kk = k
    val childOutput = child.output
    if (partial) {
      val maxKeysInFlight =
        conf.getConfString("spark.graft.topk.maxKeysInFlight", "1000000").toInt
      val maxBytesInFlight =
        conf.getConfString("spark.graft.topk.maxBytesInFlight",
          (256L << 20).toString).toLong
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        val sortProj = UnsafeProjection.create(sortOrders.map(_.child), childOutput)
        val rowProj = UnsafeProjection.create(childOutput, childOutput)
        val bound = sortOrders.zipWithIndex.map { case (so, i) =>
          so.copy(child = BoundReference(i, so.child.dataType, so.child.nullable))
        }
        val rowOrd = new InterpretedOrdering(bound)
        final class Entry(val sortKey: UnsafeRow, val row: UnsafeRow) {
          def bytes: Long = sortKey.getSizeInBytes.toLong + row.getSizeInBytes
        }
        val cmp = new java.util.Comparator[Entry] {
          override def compare(a: Entry, b: Entry): Int =
            -rowOrd.compare(a.sortKey, b.sortKey) // max-heap: head = worst kept
        }
        val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[Entry]]()
        // retained bytes of every live copied key/sort-key/row — the
        // second valve axis (a key-count cap alone is byte-blind)
        var retainedBytes = 0L
        import scala.jdk.CollectionConverters._
        def drain(): Iterator[InternalRow] = {
          val hs = new java.util.ArrayList(heaps.values())
          heaps.clear()
          retainedBytes = 0L
          hs.iterator().asScala.flatMap { heap =>
            // ascending sort order per key (deterministic emission)
            val buf = new Array[Entry](heap.size())
            var i = heap.size() - 1
            while (i >= 0) { buf(i) = heap.poll(); i -= 1 }
            buf.iterator.map(_.row: InternalRow)
          }
        }
        def offer(row: InternalRow): Unit = {
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[Entry](kk + 1, cmp)
            val keyCopy = key.copy()
            heaps.put(keyCopy, heap)
            retainedBytes += keyCopy.getSizeInBytes
          }
          val sortKey = sortProj(row)
          if (heap.size() < kk) {
            val e = new Entry(sortKey.copy(), rowProj(row).copy())
            heap.add(e)
            retainedBytes += e.bytes
          } else if (rowOrd.compare(sortKey, heap.peek().sortKey) < 0) {
            retainedBytes -= heap.poll().bytes
            val e = new Entry(sortKey.copy(), rowProj(row).copy())
            heap.add(e)
            retainedBytes += e.bytes
          }
        }
        new Iterator[InternalRow] {
          private var pending: Iterator[InternalRow] = Iterator.empty
          private def advance(): Unit = {
            while (!pending.hasNext && (iter.hasNext || !heaps.isEmpty)) {
              var flushed = false
              while (iter.hasNext && !flushed) {
                offer(iter.next())
                if (heaps.size() > maxKeysInFlight ||
                    retainedBytes > maxBytesInFlight) { // the flush valve
                  pending = drain(); flushed = true
                }
              }
              if (!flushed) pending = drain() // input exhausted
            }
          }
          override def hasNext: Boolean = { advance(); pending.hasNext }
          override def next(): InternalRow = { advance(); pending.next() }
        }
      }, preservesPartitioning = true)
    } else {
      // streaming group-take over the (keys, order)-sorted pruned stream:
      // O(1) state — current group key + emitted count
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        val rowProj = UnsafeProjection.create(childOutput, childOutput)
        var currentKey: UnsafeRow = null
        var emitted = 0
        iter.flatMap { row =>
          val key = keyProj(row)
          if (currentKey == null || key != currentKey) {
            currentKey = key.copy()
            emitted = 0
          }
          if (emitted < kk) {
            emitted += 1
            Iterator.single(rowProj(row).copy(): InternalRow)
          } else Iterator.empty
        }
      }, preservesPartitioning = true)
    }
  }
}
