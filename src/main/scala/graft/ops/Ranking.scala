package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking. A bare `row_number() OVER (ORDER BY ...)`
  * or `ntile(b) OVER (ORDER BY ...)` has an empty PARTITION BY, so Spark
  * funnels EVERY row through one reducer — the canonical single-partition
  * window bottleneck, instant death at 100 TB.
  *
  * This is the two-phase scan instead (same pattern as [[Pack]]):
  * range-partition on the sort key so partition order equals sort order,
  * rank locally per partition (parallel), then add per-partition base
  * offsets computed from a tiny per-partition count aggregate (driver
  * holds O(numPartitions) longs — bounded, like IVF's centroids).
  *
  * Equal sort keys always land in the same range partition (the
  * partitioner is a pure function of the key), so local ranking never
  * splits a tie group across workers; still, pass a TOTAL order (include a
  * unique tiebreak column) for deterministic output.
  */
object Ranking {

  /** Range-partitioned frame + per-partition base offsets + total count.
    * The localCheckpoint pins row placement so the count pass and the
    * rank pass see identical partitioning.
    */
  private def withBases(df: DataFrame, sortCols: Seq[Column],
      numPartitions: Int): (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df
      .repartitionByRange(n, sortCols: _*)
      .withColumn("__bucket", spark_partition_id())
      .localCheckpoint()
    val counts = parted.groupBy("__bucket")
      .agg(count(lit(1)).as("__n")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val bases = counts.scanLeft((0, 0L)) {
      case ((_, acc), (bucket, c)) => (bucket, acc + c)
    }
    val baseOffsets = counts.map(_._1).zip(bases.map(_._2))
    val basesDf = spark.createDataFrame(baseOffsets.toSeq)
      .toDF("__bucket", "__base")
    val total = counts.map(_._2).sum
    (parted.join(broadcast(basesDf), Seq("__bucket")), total)
  }

  /** Exact global `row_number` (1-based, long) over `sortCols`, fully
    * parallel. Output: input columns + `out`.
    */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
      out: String = "rn", numPartitions: Int = 0): DataFrame = {
    val w = Window.partitionBy("__bucket").orderBy(sortCols: _*)
    val (based, _) = withBases(df, sortCols, numPartitions)
    based
      .withColumn(out, col("__base") + row_number().over(w).cast("long"))
      .drop("__bucket", "__base")
  }

  /** Exact `ntile(buckets)` with SQL window semantics — n rows split into
    * `buckets` groups, the first n mod buckets groups one row larger —
    * without the single-reducer window. Output: input columns + `out`
    * (long, 1-based).
    */
  def ntileExact(df: DataFrame, buckets: Int, sortCols: Seq[Column],
      out: String = "bucket", numPartitions: Int = 0): DataFrame = {
    require(buckets > 0, s"buckets must be positive: $buckets")
    val w = Window.partitionBy("__bucket").orderBy(sortCols: _*)
    val (based, total) = withBases(df, sortCols, numPartitions)
    // SQL ntile: with q = n div b, r = n mod b, the first r buckets have
    // q+1 rows. Rows 1..r*(q+1) map by div(q+1); the rest by div(q) after
    // shifting past the large buckets.
    val q = total / buckets
    val r = total % buckets
    val cut = r * (q + 1)
    val rn = col("__base") + row_number().over(w).cast("long")
    val tile =
      if (q == 0) rn // fewer rows than buckets: row i → bucket i
      else when(rn <= cut, (rn - 1) / (q + 1) + 1)
             .otherwise(lit(r) + (rn - cut - 1) / q + 1)
    based
      .withColumn(out, tile.cast("long"))
      .drop("__bucket", "__base")
  }

  /** Exact global `cume_dist` over `keyCols` — peer-inclusive count of
    * rows with key <= current key, divided by n; 1.0 for the last peer
    * group — without the single-reducer window. The local window keeps
    * Spark's DEFAULT frame (RANGE UNBOUNDED PRECEDING..CURRENT ROW),
    * which is peer-inclusive, so `base + count over frame` is the global
    * peer-inclusive count: equal keys never straddle range partitions
    * and every earlier partition holds strictly smaller keys.
    * Output: input columns + `out` (double).
    */
  def cumeDistExact(df: DataFrame, keyCols: Seq[Column],
      out: String = "cume_dist", numPartitions: Int = 0): DataFrame = {
    val w = Window.partitionBy("__bucket").orderBy(keyCols: _*)
    val (based, total) = withBases(df, keyCols, numPartitions)
    val cnt = col("__base") + count(lit(1)).over(w)
    val cd =
      if (total == 0L) lit(0.0) // no rows survive anyway
      else cnt.cast("double") / lit(total.toDouble)
    based
      .withColumn(out, cd)
      .drop("__bucket", "__base")
  }

  /** Exact global `percent_rank` over `keyCols` — RANK semantics (tied
    * keys share a rank), (rank - 1) / (n - 1), 0.0 for a single row —
    * without the single-reducer window. Correctness of the split rank:
    * equal keys always land in the same range partition, so a tie group
    * never straddles workers and local `rank() + base` IS the global
    * rank. Output: input columns + `out` (double).
    */
  def percentRankExact(df: DataFrame, keyCols: Seq[Column],
      out: String = "pct_rank", numPartitions: Int = 0): DataFrame = {
    val w = Window.partitionBy("__bucket").orderBy(keyCols: _*)
    val (based, total) = withBases(df, keyCols, numPartitions)
    val globalRank = col("__base") + rank().over(w).cast("long")
    val pct =
      if (total <= 1L) lit(0.0)
      else (globalRank - 1L).cast("double") / lit((total - 1L).toDouble)
    based
      .withColumn(out, pct)
      .drop("__bucket", "__base")
  }
}
