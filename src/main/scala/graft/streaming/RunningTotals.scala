package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Input row for the running-totals processor: one event's user + exact
  * integer cents.
  */
final case class UserSpend(user_id: Long, cents: Long)

/** Output row: the user's running totals AS OF the current micro-batch. */
final case class RunningTotals(user_id: Long, n_events: Long, spend_cents: Long)

/** Arbitrary-state streaming via Spark 4's `transformWithState` — the
  * successor API to `mapGroupsWithState` (typed per-key state handles,
  * TTL support, timers; requires the RocksDB state store provider). The
  * processor keeps ONE ValueState[(n, spend)] per user and emits the
  * updated totals each micro-batch the user appears in — the canonical
  * "live per-entity counters" shape (feature-store freshness, spend
  * caps, rate limits).
  *
  * State is O(active users) and both accumulators are exact longs, so
  * stream/batch parity is EXACT — q212 gates the final totals against
  * the batch groupBy twin in DuckDB.
  */
final class RunningTotalsProcessor
    extends StatefulProcessor[Long, UserSpend, RunningTotals] {

  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)]("totals",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[UserSpend],
      timerValues: TimerValues): Iterator[RunningTotals] = {
    var (n, s) = if (totals.exists()) totals.get() else (0L, 0L)
    rows.foreach { r => n += 1; s += r.cents }
    totals.update((n, s))
    Iterator.single(RunningTotals(key, n, s))
  }
}
