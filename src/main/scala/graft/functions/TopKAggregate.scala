package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-state grouped top-k.
  *
  * The window idiom (`row_number() OVER (PARTITION BY g ORDER BY v DESC)`
  * then `rn <= k`) shuffles and sorts EVERY row of every group. This
  * aggregator keeps only the current best k in its buffer, so partial
  * aggregation (map-side combine) reduces each group to ≤ k items per
  * input partition before the shuffle — at 100 TB, the exchange carries
  * O(groups x k) instead of O(rows).
  *
  * Ordering matches the window form exactly: score descending with
  * Spark's sort semantics (NaN sorts GREATER than every value, so NaN
  * rows rank first, as `desc` does), id ascending on ties; null scores
  * or ids are skipped (as `desc_nulls_last` keeps them out of the top-k).
  * Output is the sorted (score, id) list; rank = 1 + position.
  */
object TopKAggregate {

  final case class Scored(score: Double, id: Long)

  /** Boxed input row: lets the aggregator SEE null scores/ids (a primitive
    * Double input would silently decode SQL null as 0.0 and rank it).
    */
  final case class ScoredIn(score: java.lang.Double, id: java.lang.Long)

  /** Buffer = up to k best items, kept sorted best-first (k is small; an
    * insertion into a ≤k array beats heap constant factors and keeps the
    * buffer deterministic for encoder round-trips).
    */
  final case class TopKBuf(items: Seq[Scored])

  // total order via Double.compare: NaN > every value (Spark's sort
  // semantics), -0.0 < 0.0 — so the aggregator ranks exactly as the
  // window's ORDER BY score DESC, id ASC does
  private def better(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  final class TopK(k: Int) extends Aggregator[ScoredIn, TopKBuf, Seq[Scored]] {
    require(k > 0)

    override def zero: TopKBuf = TopKBuf(Vector.empty)

    private def insert(b: TopKBuf, a: Scored): TopKBuf =
      if (b.items.size >= k && !better(a, b.items.last)) b
      else {
        val i = b.items.indexWhere(x => better(a, x)) match {
          case -1 => b.items.size
          case j  => j
        }
        // single take(k) AFTER insertion: inserting at i=size when the new
        // item exactly ties the last element must still cap the buffer at k
        TopKBuf(((b.items.take(i) :+ a) ++ b.items.drop(i)).take(k))
      }

    override def reduce(b: TopKBuf, a: ScoredIn): TopKBuf =
      if (a == null || a.score == null || a.id == null) b
      else insert(b, Scored(a.score, a.id))

    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      b.items.foldLeft(a)(insert)

    override def finish(b: TopKBuf): Seq[Scored] = b.items

    override def bufferEncoder: Encoder[TopKBuf] = ExpressionEncoder[TopKBuf]()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  }

  /** Column form: `topK(5, score, id)` → `array<struct<score,id>>` sorted
    * best-first (the udaf flattens the `Scored` input encoder into two
    * value parameters).
    */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopK(k))

  def topK(k: Int, score: Column, id: Column): Column = topK(k).apply(score, id)
}
