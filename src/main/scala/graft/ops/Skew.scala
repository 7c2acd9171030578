package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the shapes that break at 100 TB: a few
  * hot keys (one mega-city location, one dominant document source) turning
  * a shuffle into a single straggler task.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) handles the
  * sort-merge-join case at runtime; these helpers cover the two shapes AQE
  * does not rewrite: hot-key *aggregation* (two-phase salted agg) and
  * hot-key *broadcast-ineligible joins* (salt × replicate).
  */
object Skew {

  /** Two-phase salted aggregation: partial aggregate on (keys, salt), then
    * final aggregate on keys. Decomposable aggregates only — the caller
    * provides both phases (e.g. partial `sum`/final `sum`, or
    * partial (sum, count)/final (sum/count) for averages).
    *
    * Phase 1 spreads each hot key over `saltBuckets` reducers; phase 2
    * combines `saltBuckets` rows per key — negligible. Equivalent to
    * map-side combine with a guaranteed fan-out even when upstream
    * partitioning is adversarial.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int)(
      partial: Seq[Column],
      finalAgg: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Salted count per key — the common case packaged. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int = 32): DataFrame =
    saltedAgg(df, keys, saltBuckets)(
      Seq(count(lit(1)).as("__partial_n")),
      Seq(sum("__partial_n").as("n")))

  /** Salted skew join for a large skewed left side against a
    * non-broadcastable right side: left rows get a random salt in
    * [0, saltBuckets), right rows are replicated once per salt value, and
    * the join key becomes (key, salt) — splitting each hot key across
    * `saltBuckets` tasks at the cost of `saltBuckets`× the right side's
    * shuffle volume. Use only when the right side is too big to broadcast
    * but much smaller than the left (the classic fact × mid-size-dim skew).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltBuckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    // right/full outer would emit every unmatched right row once PER SALT
    // REPLICA — the salting scheme is only sound for join types that never
    // emit unmatched right rows
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")(normalized),
      s"saltedJoin supports inner/left/left_semi/left_anti, not $joinType " +
        s"(unmatched right rows would be duplicated x$saltBuckets)")
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedLeft
      .join(replicatedRight, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Report per-key frequencies above a threshold fraction — the
    * diagnostic that decides whether salting is worth its shuffle cost.
    * One pass, no collect.
    */
  def hotKeys(df: DataFrame, key: String, minFraction: Double = 0.01): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(key)
      .agg(count(lit(1)).as("n"))
      .withColumn("fraction", col("n") / total)
      .filter(col("fraction") >= minFraction)
      .orderBy(desc("n"))
  }
}
