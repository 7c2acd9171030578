package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-state grouped min-k by an opaque string sort key — the
  * deterministic "uniform sample of k rows per group" primitive when the
  * key is a hash (md5 of the row id): the k smallest hashes are a uniform
  * k-subset, stable across re-runs, retries and repartitioning.
  *
  * The window idiom (`row_number() OVER (PARTITION BY g ORDER BY md5(id))`
  * then `rn <= k`) shuffles and sorts EVERY row of every group; this
  * aggregator's buffer holds only the current k smallest, so partial
  * aggregation collapses each group to ≤ k items per input partition
  * before the exchange — O(groups × k) shuffled, independent of group
  * size. Same design as [[TopKAggregate]], with a string key ordered
  * ascending (lexicographic, id-ascending tiebreak) instead of a double
  * score descending.
  */
object MinKAggregate {

  final case class Keyed(key: String, id: Long)

  /** Boxed input row so SQL nulls are visible (and skipped) rather than
    * decoded to defaults.
    */
  final case class KeyedIn(key: String, id: java.lang.Long)

  final case class MinKBuf(items: Seq[Keyed])

  // lexicographic key ascending, id ascending on ties — exactly the
  // window's ORDER BY key, id. Spark sorts strings by UNSIGNED UTF-8
  // bytes; Java's String.compareTo sorts UTF-16 code units, and the two
  // disagree beyond the BMP (e.g. U+FFFF vs U+10000 — surrogates sort low
  // in UTF-16, high in UTF-8), so compare bytes, not chars.
  private def compareUtf8(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }

  private def before(a: Keyed, b: Keyed): Boolean = {
    val c = compareUtf8(a.key, b.key)
    c < 0 || (c == 0 && a.id < b.id)
  }

  final class MinK(k: Int) extends Aggregator[KeyedIn, MinKBuf, Seq[Keyed]] {
    require(k > 0)

    override def zero: MinKBuf = MinKBuf(Vector.empty)

    private def insert(b: MinKBuf, a: Keyed): MinKBuf =
      if (b.items.size >= k && !before(a, b.items.last)) b
      else {
        val i = b.items.indexWhere(x => before(a, x)) match {
          case -1 => b.items.size
          case j  => j
        }
        // cap AFTER inserting: an exact tie with the last element at
        // capacity must still leave k items
        MinKBuf(((b.items.take(i) :+ a) ++ b.items.drop(i)).take(k))
      }

    override def reduce(b: MinKBuf, a: KeyedIn): MinKBuf =
      if (a == null || a.key == null || a.id == null) b
      else insert(b, Keyed(a.key, a.id))

    override def merge(a: MinKBuf, b: MinKBuf): MinKBuf =
      b.items.foldLeft(a)(insert)

    override def finish(b: MinKBuf): Seq[Keyed] = b.items

    override def bufferEncoder: Encoder[MinKBuf] = ExpressionEncoder[MinKBuf]()
    override def outputEncoder: Encoder[Seq[Keyed]] = ExpressionEncoder[Seq[Keyed]]()
  }

  /** Column form: `minK(10, md5(id), id)` → `array<struct<key,id>>` sorted
    * key-ascending; explode for the sampled rows, position = sample rank.
    */
  def minK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MinK(k))

  def minK(k: Int, key: Column, id: Column): Column = minK(k).apply(key, id)
}
