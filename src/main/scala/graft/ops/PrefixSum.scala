package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXCLUSIVE prefix sum — the running-total primitive under
  * [[WeightedSample]] (cumulative-weight intervals), token-budget corpus
  * cuts (q164), and [[Pack]]-style offset assignment. A naive
  * `sum() OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)` has an empty
  * PARTITION BY — the same single-reducer funnel [[Ranking]] exists to
  * avoid — so this is the identical two-phase shape: range-partition on
  * the sort key (partition order = sort order), local window cumsum per
  * bucket, then add per-bucket base offsets from an O(numPartitions)
  * driver aggregate.
  *
  * `sortCols` must be a TOTAL order for a deterministic result (same
  * contract as Ranking: ties never straddle range partitions, but
  * within-bucket tie order would be nondeterministic).
  */
object PrefixSum {

  /** Exclusive prefix sum of `valueCol` (cast to long) over the global
    * `sortCols` order, plus the grand total: first row gets 0, each next
    * row the sum of all STRICTLY EARLIER rows. Output: input columns +
    * `out` (long); the returned frame is placement-pinned
    * ([[Ranking.pin]]) so downstream passes see consistent buckets.
    */
  def exclusiveWithTotal(df: DataFrame, sortCols: Seq[Column],
      valueCol: Column, out: String = "cum",
      numPartitions: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = Ranking.pin(
      df.withColumn("__v", valueCol.cast("long"))
        .repartitionByRange(n, sortCols: _*)
        .withColumn("__bucket", spark_partition_id()),
      durable = false)
    val bucketSums = parted.groupBy("__bucket")
      .agg(sum(col("__v")).as("__s")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val bases = bucketSums.scanLeft((0, 0L)) {
      case ((_, acc), (b, s)) => (b, acc + s)
    }
    val offsets = bucketSums.map(_._1).zip(bases.map(_._2))
    val total = bucketSums.map(_._2).sum
    val basesDf = spark.createDataFrame(offsets.toSeq).toDF("__bucket", "__base")
    val localCum = sum(col("__v")).over(
      Window.partitionBy("__bucket").orderBy(sortCols: _*)
        .rowsBetween(Window.unboundedPreceding, -1))
    val result = parted.join(broadcast(basesDf), Seq("__bucket"))
      .withColumn(out, coalesce(localCum, lit(0L)) + col("__base"))
      .drop("__bucket", "__base", "__v")
    (result, total)
  }

  /** [[exclusiveWithTotal]] without the total. */
  def exclusive(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
      out: String = "cum", numPartitions: Int = 0): DataFrame =
    exclusiveWithTotal(df, sortCols, valueCol, out, numPartitions)._1
}
