package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Count-Min sketch (Cormode & Muthukrishnan) as a mergeable typed
  * Aggregator: fixed `depth × width` memory regardless of item
  * cardinality, one-sided error — an estimate NEVER undercounts, and
  * overshoots by more than εN (ε = e/width) with probability ≤ e^-depth.
  *
  * Complements [[HeavyHitters]]' Misra-Gries summary: MG enumerates a
  * bounded candidate set (discovery), CMS answers post-hoc point queries
  * for ANY probe item from one pass's sketch — the shape for "estimate
  * frequencies of this watchlist over 100 TB without a GROUP BY over the
  * full vocabulary". Partial aggregation merges sketches (elementwise
  * add), so the exchange carries O(partitions × depth × width) longs,
  * independent of both row count and vocabulary.
  *
  * Exactness pattern (mirrors HeavyHitters): the sketch's no-undercount
  * guarantee makes `estimate ≥ t` a SUPERSET of the truly-heavy probes, so
  * sketch-filter → exact count of survivors → threshold reproduces the
  * exact HAVING result at any sketch size.
  */
object CountMin {

  /** Row-major depth × width counter matrix. */
  final case class CMSBuf(counts: Array[Long])

  /** Bucket of `item` in sketch row `row` — deterministic (MurmurHash3 of
    * the string with a per-row seed), identical on every executor/retry.
    */
  def bucket(item: String, row: Int, width: Int, seed: Int): Int =
    math.floorMod(MurmurHash3.stringHash(item, seed ^ (0x9e3779b9 * (row + 1))), width)

  final class Sketch(depth: Int, width: Int, seed: Int)
      extends Aggregator[String, CMSBuf, Array[Long]] {
    require(depth > 0 && width > 0, s"bad sketch geometry: $depth x $width")

    override def zero: CMSBuf = CMSBuf(new Array[Long](depth * width))

    override def reduce(b: CMSBuf, item: String): CMSBuf = {
      if (item != null) {
        var r = 0
        while (r < depth) {
          b.counts(r * width + bucket(item, r, width, seed)) += 1
          r += 1
        }
      }
      b
    }

    override def merge(a: CMSBuf, b: CMSBuf): CMSBuf = {
      var i = 0
      while (i < a.counts.length) { a.counts(i) += b.counts(i); i += 1 }
      a
    }

    override def finish(b: CMSBuf): Array[Long] = b.counts

    override def bufferEncoder: Encoder[CMSBuf] = ExpressionEncoder[CMSBuf]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Point estimate from a finished sketch: min over the depth rows —
    * ≥ the true count always; ≤ true + e/width × N w.p. 1 - e^-depth.
    */
  def estimate(counts: Array[Long], item: String, depth: Int, width: Int,
      seed: Int): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counts(r * width + bucket(item, r, width, seed))
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** One-pass sketch of an item column (null items are skipped, as in
    * COUNT). The result is a single depth×width row — collect it (bounded:
    * depth × width × 8 bytes, the same driver footprint class as IVF's
    * centroid matrix) and answer any number of point queries from it.
    */
  def sketch(df: DataFrame, item: Column, depth: Int = 4, width: Int = 1024,
      seed: Int = 42): Array[Long] =
    df.select(udaf(new Sketch(depth, width, seed)).apply(item).as("sk"))
      .head().getSeq[Long](0).toArray

  /** Exactly the probe items with global count ≥ minCount, as (item, n).
    *
    * Pass 1 sketches the stream; probes whose ESTIMATE clears the bar are
    * a superset of the true heavy probes (no-undercount), so pass 2 exact-
    * counts only `item IN (survivors)` — a scan-side IN filter over a
    * handful of literals, then a tiny aggregation — and re-applies the
    * threshold to discard the sketch's false positives.
    */
  def heavyProbes(df: DataFrame, item: Column, probes: Seq[String],
      minCount: Long, depth: Int = 4, width: Int = 1024,
      seed: Int = 42): DataFrame = {
    require(minCount > 0, s"minCount must be positive: $minCount")
    val sk = sketch(df, item, depth, width, seed)
    val survivors = probes.distinct
      .filter(p => estimate(sk, p, depth, width, seed) >= minCount)
    if (survivors.isEmpty)
      df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("item",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType, nullable = false))))
    else
      df.select(item.as("item"))
        .filter(col("item").isin(survivors: _*))
        .groupBy("item")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= minCount)
  }
}
