package graft.streaming

import graft.ops.HeavyHitters.{MGBuf, MisraGries}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** One tokenized stream row, pre-bucketed: `bucket` = hash(token) mod B,
  * so every occurrence of a token lands in ONE state partition and the
  * per-bucket Misra-Gries guarantee applies to its full stream count.
  */
final case class BucketToken(bucket: Int, token: String)

/** One surviving MG counter as of the current micro-batch: a CANDIDATE
  * heavy hitter (est is the usual MG undercount, not the true count).
  */
final case class MgCandidate(bucket: Int, item: String, est: Long)

/** Streaming Misra-Gries via `transformWithState` — the unbounded-stream
  * twin of [[graft.ops.HeavyHitters]] (q86): each bucket keeps ONE
  * ValueState holding its <= k MG counters, folded with the SAME
  * step/eviction function the batch Aggregator uses
  * ([[MisraGries.reduce]] — literally the same method, so the two
  * surfaces cannot drift), and emits its surviving counters each
  * micro-batch. State is O(buckets x k) REGARDLESS of stream length or
  * vocabulary — the property that makes top-k telemetry affordable on an
  * unbounded token stream where an exact groupBy's state would grow with
  * the vocabulary.
  *
  * The emitted items are a SUPERSET of every token with true stream
  * count >= N/k (MG's guarantee, per bucket — a token's bucket count IS
  * its stream count since the bucket is a function of the token); the
  * caller re-counts candidates exactly against the corpus (q86's
  * verify discipline), so order-dependent MG internals never reach the
  * result.
  */
final class MisraGriesProcessor(k: Int)
    extends StatefulProcessor[Int, BucketToken, MgCandidate] {

  @transient private var summary: ValueState[Map[String, Long]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    summary = getHandle.getValueState[Map[String, Long]]("mg",
      ExpressionEncoder[Map[String, Long]](), TTLConfig.NONE)

  override def handleInputRows(key: Int, rows: Iterator[BucketToken],
      timerValues: TimerValues): Iterator[MgCandidate] = {
    val mg = new MisraGries(k)
    var buf = MGBuf(if (summary.exists()) summary.get() else Map.empty)
    rows.foreach(r => buf = mg.reduce(buf, r.token))
    summary.update(buf.counts)
    buf.counts.iterator.map { case (item, est) => MgCandidate(key, item, est) }
  }
}
