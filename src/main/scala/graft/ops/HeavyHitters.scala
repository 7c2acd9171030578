package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact heavy hitters — items whose global count ≥ a threshold — without
  * shuffling the full item cardinality.
  *
  * `GROUP BY item HAVING count ≥ s` exchanges one partial-agg row per
  * DISTINCT item per partition; at web-corpus vocabulary sizes (billions
  * of distinct n-grams) that shuffle dwarfs the answer. Two bounded passes
  * instead:
  *
  *  1. a Misra-Gries summary as a typed Aggregator: every partition keeps
  *     at most k counters, merges are counter-sums followed by the MG
  *     offset-decrement. Classic guarantee: the summary undercounts by at
  *     most N/k, so every item with true count > N/k SURVIVES — the k-item
  *     summary is a superset of the heavy hitters. The exchange carries
  *     O(partitions × k), independent of vocabulary size.
  *  2. an exact count of only the candidates (broadcast semi join on the
  *     ≤ k survivors), then the threshold filter — false candidates from
  *     the sketch's overcount are removed here, so the result is exactly
  *     the HAVING query's.
  *
  * k is auto-sized to N/minCount + 1 (the smallest summary that cannot
  * evict a true heavy hitter) and capped — a threshold so low that the
  * guarantee needs an unbounded summary is an error, not a silent wrong
  * answer.
  */
object HeavyHitters {

  final case class MGBuf(counts: Map[String, Long])

  final class MisraGries(k: Int) extends Aggregator[String, MGBuf, Map[String, Long]] {
    require(k > 0, s"summary size must be positive: $k")

    override def zero: MGBuf = MGBuf(Map.empty)

    override def reduce(b: MGBuf, item: String): MGBuf =
      if (item == null) b
      else b.counts.get(item) match {
        case Some(c)                   => MGBuf(b.counts.updated(item, c + 1))
        case None if b.counts.size < k => MGBuf(b.counts.updated(item, 1L))
        case None =>
          // all k slots taken: decrement every counter (dropping zeros)
          // instead of admitting the item — the MG eviction step
          MGBuf(b.counts.collect { case (i, c) if c > 1 => i -> (c - 1) })
      }

    override def merge(a: MGBuf, b: MGBuf): MGBuf = {
      val sum = b.counts.foldLeft(a.counts) { case (m, (i, c)) =>
        m.updated(i, m.getOrElse(i, 0L) + c)
      }
      if (sum.size <= k) MGBuf(sum)
      else {
        // keep the top k by subtracting the (k+1)-th largest count from
        // everything — the merge form of the MG decrement, preserving the
        // aggregate undercount bound (Agarwal et al.'s mergeable
        // summaries result)
        val cut = sum.valuesIterator.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        MGBuf(sum.collect { case (i, c) if c > cut => i -> (c - cut) })
      }
    }

    override def finish(b: MGBuf): Map[String, Long] = b.counts

    override def bufferEncoder: Encoder[MGBuf] = ExpressionEncoder[MGBuf]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** The ≤ k candidate items from one distributed MG pass (superset of
    * every item with true count > N/k). One column `item`.
    */
  def candidates(df: DataFrame, item: Column, k: Int): DataFrame =
    df.select(udaf(new MisraGries(k)).apply(item).as("summary"))
      .select(explode(map_keys(col("summary"))).as("item"))

  /** Exactly the items with global count ≥ minCount, as (item, n) — the
    * HAVING query's result over NON-NULL items (SQL's NULL group is
    * deliberately excluded; COALESCE to a sentinel upstream if it
    * matters). Null rows are dropped before sizing so they can neither
    * inflate k nor vanish silently.
    *
    * Runs three scans of the input (size count, MG pass, exact count) —
    * persist it if the scan is not cheap. The driver never holds more
    * than the ≤ k candidate set (broadcast to the exact pass).
    */
  def heavyHitters(df: DataFrame, item: Column, minCount: Long,
      maxSummarySize: Int = 1 << 17): DataFrame = {
    require(minCount > 0, s"minCount must be positive: $minCount")
    val items = df.select(item.as("item")).filter(col("item").isNotNull)
    val n = items.count()
    val k = n / minCount + 1
    require(k <= maxSummarySize,
      s"minCount=$minCount over $n rows needs a $k-counter summary " +
        s"(cap $maxSummarySize) — raise the threshold or the cap")
    items
      .join(broadcast(candidates(items, col("item"), k.toInt)), Seq("item"), "left_semi")
      .groupBy("item")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }
}
