package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted sampling WITH replacement by integer cumulative-weight
  * inversion — the corpus-mixing primitive for "sample k documents
  * proportional to length/quality weight" (reference-class pipelines
  * weight by token count when building training mixes; cf. the epoch
  * weights in [[Sampling.corpusMix]] which replicate rows by a FIXED
  * per-source factor, where this draws k rows proportional to a
  * PER-ROW weight).
  *
  * All arithmetic is exact integer math — cumulative ranges are longs,
  * the k draw targets are md5-derived uniforms reduced mod total weight
  * — so two engines agree bit-for-bit (the repo's standard oracle
  * discipline: no floating-point selection boundaries).
  *
  * Shape at scale: one range shuffle for the prefix sum ([[PrefixSum]]
  * — the [[Ranking]]-style two-phase scan: local cumsum per range
  * bucket + O(buckets) driver offsets), then the k targets BROADCAST
  * against the corpus
  * with a range-containment predicate — k constant, so the probe is one
  * map-side pass, no corpus shuffle, no driver materialization beyond
  * the O(buckets) sums and the k draws.
  */
object WeightedSample {

  /** Draw `k` rows with replacement, P(row) proportional to `weightCol`
    * (long-valued, rows with weight <= 0 are excluded). Deterministic:
    * draw `i` targets `uniform(md5(i)) mod totalWeight` and selects the
    * unique row whose cumulative-weight interval contains the target.
    * Output: (draw_id, <idCol>, weight) — one row per draw, ordered by
    * draw_id; the same corpus row may win several draws (replacement).
    *
    * The mod reduction carries the usual ~W/2^32 selection bias toward
    * low targets — negligible against sampling variance for any k, and
    * the price of staying in exact integer math end-to-end.
    */
  def sampleWithReplacement(df: DataFrame, idCol: String, weightCol: String,
      k: Int, numPartitions: Int = 0): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val spark = df.sparkSession
    val base = df
      .select(col(idCol), col(weightCol).cast("long").as("__w"))
      .filter(col("__w") > 0L)
    // exclusive prefix sum in idCol order ([[PrefixSum]]: two-phase
    // range-partitioned, placement-pinned)
    val (withCum, total) = PrefixSum.exclusiveWithTotal(
      base, Seq(col(idCol)), col("__w"), "__cum", numPartitions)
    require(total > 0L, "no rows with positive weight to sample from")
    // k deterministic draw targets in [0, total): md5 prefix -> 32-bit
    // uniform -> mod total (conv() parses the 8 hex digits unsigned,
    // identical to the oracle's 0x-prefixed cast)
    val draws = spark.range(k.toLong)
      .select(col("id").as("draw_id"),
        (expr("CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8), 16, 10) AS BIGINT)")
          % total).as("__target"))
    withCum.join(broadcast(draws),
        col("__target") >= col("__cum") &&
        col("__target") < col("__cum") + col("__w"))
      .select(col("draw_id"), col(idCol), col("__w").as("weight"))
  }

  /** Draw `k` DISTINCT rows, P proportional to `weightCol`, by A-Res
    * (Efraimidis-Spirakis reservoir keys): each row gets
    * key = ln(u) / w with u the row's md5-derived uniform, and the k
    * LARGEST keys win — equivalent to ranking u^(1/w), the standard
    * weighted-sampling-without-replacement scheme. The complement of
    * [[sampleWithReplacement]]: no cumulative structure, no prefix sum —
    * one map-side key computation + TakeOrdered(k), which is the whole
    * point at scale (the reservoir is the top-k heap, never a shuffle of
    * the corpus).
    *
    * Determinism discipline: u = (h + 1) / 2^32 is an exact rational of
    * the 32-bit md5 prefix, and the key is SNAPPED to the 1e-9 grid
    * (floor) before ranking, ties broken by id — the selection boundary
    * is an integer comparison, so engines can only disagree if their
    * libm `ln` results straddle a 1e-9 cell edge (error analysis: ulp of
    * ln(u) <= 2.4e-15, scaled flip probability ~1e-7 per row).
    *
    * Output: (<idCol>, weight, key_e9), the k winners by
    * (key_e9 desc, id).
    */
  def sampleWithoutReplacement(df: DataFrame, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val base = df
      .select(col(idCol), col(weightCol).cast("long").as("weight"))
      .filter(col("weight") > 0L)
    val h = expr(s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 8), 16, 10) AS BIGINT)")
    val u = (h + lit(1L)).cast("double") / lit(4294967296.0)
    val keyE9 = floor(log(u) / col("weight").cast("double") * lit(1e9)).cast("long")
    base.withColumn("key_e9", keyE9)
      .orderBy(col("key_e9").desc, col(idCol))
      .limit(k)
  }
}
