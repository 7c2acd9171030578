package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture and table-maintenance operators: SCD Type-2
  * history compaction, snapshot diffing, and CDC upsert/delete merge.
  *
  * The reference pipeline's mart is append-only with in-batch dedup
  * (SURVEY §2.9) — reruns duplicate and updates never happen. A real
  * lakehouse table needs the three missing maintenance verbs: turn a
  * change log into validity intervals (SCD2), diff two snapshots, and
  * apply a change feed onto a base table. All three are single-shuffle
  * plans keyed on the entity key: at 100 TB the only exchange is the
  * hash partition on `key`, reused across the window/join stages, and
  * nothing ever funnels through the driver or a single reducer.
  */
object ChangeCapture {

  /** Collapse an ordered attribute log into SCD Type-2 validity
    * intervals: one output row per run of equal `attr` values, with
    * `version` (1-based per key), `valid_from` / `valid_to` (the `seq`
    * value at the change and at the next change; `valid_to` NULL for the
    * open interval) and `is_current`.
    *
    * `seq` must be a BIGINT-ish ordering column (epoch millis, a log
    * sequence number); `tie` makes the per-key order total when `seq`
    * collides. Attribute comparisons are null-safe: a NULL attr value is
    * a distinct state, not a wildcard.
    *
    * Plan shape: one hash exchange on `key`; both window passes (change
    * detection, then versioning over the surviving change rows) share
    * the same partitioning and ordering, so the sort is paid once and
    * the filter between them preserves it.
    */
  def scd2(log: DataFrame, key: String, attr: String,
      seq: Column, tie: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(seq, tie)
    // Both same-spec window aggregates in ONE select — interleaved
    // Projects defeat CollapseWindow (NOTES.md window-collapse trap).
    val changes = log
      .select(col("*"), seq.as("__seq"),
        lag(col(attr), 1).over(w).as("__prev"),
        (row_number().over(w) === 1).as("__first"))
      .filter(col("__first") || !(col("__prev") <=> col(attr)))
    // Same spec re-windowed over the change rows only: all three
    // same-spec aggregates live in ONE select (one Window node).
    val w2 = Window.partitionBy(key).orderBy(col("__seq"), tie)
    changes.select(
      col(key),
      row_number().over(w2).cast("long").as("version"),
      col(attr),
      col("__seq").as("valid_from"),
      lead(col("__seq"), 1).over(w2).as("valid_to"),
      lead(col("__seq"), 1).over(w2).isNull.as("is_current"))
  }

  /** Merge a NEW change-log batch into an existing SCD2 dimension — the
    * incremental maintenance verb: the dimension's own rows are replayed
    * as change events (one per interval, at `valid_from`), unioned with
    * the new batch, and re-compacted by [[scd2]]. Cost is
    * O(dim + batch), never O(full history); a batch whose first value
    * equals a key's current attr EXTENDS the open interval instead of
    * opening a spurious version, and versions renumber densely.
    *
    * Contract: batches arrive in `seq` order — every new-log seq is >
    * every dim `valid_from` for the same key (equal-seq rows must never
    * straddle a batch boundary; the compaction cannot reconstruct the
    * original tie order across it). The invariant
    * `scd2Merge(scd2(log <= T), log > T) == scd2(log)` is spec-checked
    * on random histories.
    */
  def scd2Merge(dim: DataFrame, newLog: DataFrame, key: String,
      attr: String, seq: Column, tie: Column): DataFrame = {
    // version is the replay tie: two intervals of one key CAN share a
    // valid_from (equal-seq changes tie-broken by the original log's tie
    // column, which compaction discards) — version preserves that order.
    // The batch tie keeps ITS OWN type (a cast-to-long would reorder
    // numeric strings and throw on non-numeric ones under ANSI): the
    // union tie is a two-field struct, version on the dim side, the raw
    // tie on the batch side, compared lexicographically. Cross-boundary
    // equal-seq rows are excluded by the contract, so the two fields
    // never actually compete.
    val dimAsLog = dim.select(col(key), col(attr),
      col("valid_from").as("__ms"),
      col("version").as("__vtie"), lit(null).as("__btie"))
    val logNorm = newLog.select(col(key), col(attr),
      seq.as("__ms"), lit(null).cast("long").as("__vtie"),
      tie.as("__btie"))
    scd2(dimAsLog.unionAll(logNorm), key, attr, col("__ms"),
      struct(col("__vtie"), col("__btie")))
  }

  /** Classify every key across two snapshots of the same table:
    * `added` (key only in `after`), `removed` (key only in `before`),
    * `changed` (present in both, any compare column differs null-safely)
    * or `unchanged`. Returns one row per key with `change_type` plus the
    * `after`-side compare columns (the `before`-side for removals).
    *
    * Full outer hash join on the key — both sides shuffle once on the
    * same partitioning; no broadcast assumption, so it holds when both
    * snapshots are 100 TB.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compare column")
    val b = before.select((key +: compareCols).map(col): _*)
      .withColumn("__b", lit(true))
    val a = after.select((key +: compareCols).map(col): _*)
      .withColumn("__a", lit(true))
    val joined = b.alias("b").join(a.alias("a"),
      col(s"b.$key") === col(s"a.$key"), "full_outer")
    val differs = compareCols
      .map(c => !(col(s"b.$c") <=> col(s"a.$c")))
      .reduce(_ || _)
    val changeType = when(col("b.__b").isNull, "added")
      .when(col("a.__a").isNull, "removed")
      .when(differs, "changed")
      .otherwise("unchanged")
    // After-side values verbatim whenever an after row exists (a change
    // TO NULL must surface as NULL, so no coalesce); before-side only
    // for removals.
    joined.select(
      coalesce(col(s"a.$key"), col(s"b.$key")).as(key) +:
        changeType.as("change_type") +:
        compareCols.map(c => when(col("a.__a").isNotNull, col(s"a.$c"))
          .otherwise(col(s"b.$c")).as(c)): _*)
  }

  /** Apply a CDC change feed onto a base table (the MERGE INTO verbs):
    * keep the LAST change per key (ordered by `seq`, then `tie`), then
    * upsert (`I`/`U` rows replace or add the key's `valueCols`) and
    * delete (`D` rows remove the key). Base rows with no change pass
    * through. Columns of `base` outside `key`+`valueCols` are preserved
    * for surviving base rows and NULL for inserted keys.
    *
    * One shuffle on `key` for the last-change window, one for the full
    * outer join — same partitioning, so the exchange is reusable.
    */
  def applyCdc(base: DataFrame, changes: DataFrame, key: String,
      op: String, seq: Column, tie: Column,
      valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(seq.desc, tie.desc)
    val last = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((Seq(key, op) ++ valueCols).map(col): _*)
    val joined = base.alias("b").join(last.alias("c"),
      col(s"b.$key") === col(s"c.$key"), "full_outer")
    val baseOnly = base.columns.filterNot(c => c == key || valueCols.contains(c))
    joined
      .filter(!(col(s"c.$op") <=> lit("D")))
      .select(
        coalesce(col(s"c.$key"), col(s"b.$key")).as(key) +:
          // op-aware, not coalesce: a winning U/I change REPLACES the
          // value even with NULL (a CDC feed clearing a field must not
          // silently retain the base value)
          (valueCols.map(c => when(col(s"c.$op").isNotNull, col(s"c.$c"))
            .otherwise(col(s"b.$c")).as(c)) ++
            baseOnly.map(c => col(s"b.$c").as(c))): _*)
  }
}
