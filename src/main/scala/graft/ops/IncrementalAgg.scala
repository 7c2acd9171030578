package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — merge a new batch's PARTIAL
  * aggregates into a running state instead of recomputing history (the
  * 100 TB pattern: yesterday's 100 TB stays aggregated; only today's
  * slice is scanned). Correctness contract: for decomposable aggregates
  * (count/sum add, min/max combine), merge(state(A), state(B)) ==
  * state(A union B) — which is exactly what the oracle checks.
  *
  * The merge is ONE full-outer hash join on the state key — the same
  * shuffle a day's groupBy would need anyway — with null-safe combine
  * expressions; no window, no driver state.
  */
object IncrementalAgg {

  /** Merge two keyed partial-aggregate frames. `sums` columns add
    * (null ≡ 0, exact longs), `maxes` take the null-safe greatest.
    * Keys present on either side survive.
    */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String],
      sums: Seq[String], maxes: Seq[String] = Nil): DataFrame = {
    val a = sums.foldLeft(state)((df, c) => df.withColumnRenamed(c, s"__a_$c"))
    val b = sums.foldLeft(delta)((df, c) => df.withColumnRenamed(c, s"__b_$c"))
    val a2 = maxes.foldLeft(a)((df, c) => df.withColumnRenamed(c, s"__a_$c"))
    val b2 = maxes.foldLeft(b)((df, c) => df.withColumnRenamed(c, s"__b_$c"))
    val joined = a2.join(b2, keys, "full_outer")
    val combined = sums.foldLeft(joined)((df, c) =>
      df.withColumn(c,
        coalesce(col(s"__a_$c"), lit(0L)) + coalesce(col(s"__b_$c"), lit(0L))))
    maxes.foldLeft(combined)((df, c) =>
        df.withColumn(c, greatest(col(s"__a_$c"), col(s"__b_$c"))))
      .select(keys.map(col) ++ (sums ++ maxes).map(col): _*)
  }
}
