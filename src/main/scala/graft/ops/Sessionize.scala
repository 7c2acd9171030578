package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event sessionization — the canonical stateful operator over the
  * `events` stream table.
  *
  * Batch form: gap-based sessions via the lag/cumulative-sum window idiom
  * (two window functions over one shuffle on the user key). Streaming
  * form: `flatMapGroupsWithState` with event-time timeout — the custom
  * per-key state surface (SURVEY §2.9's `KeyValueGroupedDataset` path).
  */
object Sessionize {

  /** Assign gap-based session ids per user: a session breaks when the gap
    * to the previous event exceeds `gapMinutes`. Output adds `session_id`
    * (1-based per user).
    */
  def assignSessions(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(
      prev.isNull || col(tsCol) > prev + expr(s"INTERVAL $gapMinutes MINUTES"), 1L)
      .otherwise(0L)
    events.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Collapse to one row per session: bounds, event count, exact value sum
    * (2-dp doubles summed as integer cents — exact, order-independent, and
    * far cheaper than decimal aggregation; see Catalog's cents rationale).
    */
  def sessionSummaries(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      gapMinutes: Int = 30): DataFrame =
    assignSessions(events, userCol, tsCol, gapMinutes)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (sum((col("value") * 100 + signum(col("value")) * 0.5).cast("long"))
          .cast("double") / 100.0).as("sum_value"))

  // ------------------------------------------------------------ streaming

  final case class SessionInput(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionOut(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Streaming sessionization: one state entry per user, closed and
    * emitted when the event-time watermark passes last-event + gap. State
    * is O(active users); the watermark bounds it.
    */
  def streamingSessions(
      spark: SparkSession,
      events: DataFrame,
      gapMinutes: Int = 30,
      watermark: String = "1 hour"): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def update(userId: Long, rows: Iterator[SessionInput],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      var out = List.empty[SessionOut]
      var cur = state.getOption
      if (state.hasTimedOut) {
        cur.foreach { s =>
          out ::= SessionOut(userId, new java.sql.Timestamp(s.start),
            new java.sql.Timestamp(s.last), s.n, s.sum)
        }
        state.remove()
        cur = None
      }
      rows.toSeq.sortBy(_.ts.getTime).foreach { r =>
        val t = r.ts.getTime
        cur match {
          case Some(s) if t - s.last <= gapMs =>
            cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.sum + r.value))
          case Some(s) =>
            out ::= SessionOut(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.sum)
            cur = Some(SessionState(t, t, 1L, r.value))
          case None =>
            cur = Some(SessionState(t, t, 1L, r.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapMs)
      }
      out.reverseIterator
    }

    events
      .withWatermark("ts", watermark)
      .as[SessionInput]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
