package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus snapshots — the
  * check a training-data pipeline runs when a new crawl lands: has the
  * length / quality / value distribution moved versus the corpus we
  * trained on? Complements [[graft.ops.ChangeCapture]] (which diffs
  * ROWS) by diffing DISTRIBUTIONS.
  *
  * Scale shape: each histogram is ONE groupBy on a bounded fixed-width
  * bucket key (map-side partial aggregation, uniform keys), the joined
  * histogram is O(buckets) rows, and the divergence reduce runs over
  * that tiny frame — nothing materializes more than the histogram, at
  * any corpus size. The only crossJoin is histogram x its own 1-row
  * totals, broadcast.
  */
object Drift {

  /** Fixed-width value histogram: (bucket, n) with bucket = floor(v/width).
    * Double division + floor are bit-identical across engines, so bucket
    * keys are oracle-stable.
    */
  def histogram(df: DataFrame, valueCol: Column, width: Double): DataFrame = {
    require(width > 0, s"width must be positive: $width")
    df.select(floor(valueCol / width).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
  }

  /** Jensen-Shannon divergence (natural log; 0 = identical, ln 2 =
    * disjoint supports) between the `valueCol` distributions of two
    * frames over fixed-width buckets. Returns ONE row
    * `(n_a, n_b, js_nats)`. Zero-count buckets contribute 0 by the
    * 0*ln(0) = 0 convention (the `when` guards); the mixture m is
    * strictly positive on every kept bucket, so no division by zero.
    *
    * Degenerate inputs: if exactly one snapshot is empty (ta or tb = 0)
    * its distribution is undefined, so `js_nats` is NULL — the counts
    * still report which side was empty, and NULL (vs a silent NaN from
    * 0/0 propagating through the mixture) survives round-tripping
    * through parquet/SQL comparisons. If BOTH are empty there are no
    * buckets at all and the result has zero rows.
    */
  def jsDivergence(a: DataFrame, b: DataFrame, valueCol: Column,
      width: Double): DataFrame = {
    val ha = histogram(a, valueCol, width).withColumnRenamed("n", "na")
    val hb = histogram(b, valueCol, width).withColumnRenamed("n", "nb")
    val joined = ha.join(hb, Seq("bucket"), "full_outer")
      .select(
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val totals = joined.agg(
      sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    joined.crossJoin(broadcast(totals))
      .select(
        col("ta"), col("tb"),
        // the when-guards also keep ANSI mode from raising DIVIDE_BY_ZERO
        // on an empty side (CaseWhen evaluates its value lazily); a NULL
        // p/q nulls its terms and the final guard nulls js_nats
        when(col("ta") > 0, col("na").cast("double") / col("ta")).as("p"),
        when(col("tb") > 0, col("nb").cast("double") / col("tb")).as("q"))
      .withColumn("m", (col("p") + col("q")) / 2.0)
      .withColumn("term",
        when(col("p") > 0, col("p") * log(col("p") / col("m")) / 2.0)
          .otherwise(0.0) +
        when(col("q") > 0, col("q") * log(col("q") / col("m")) / 2.0)
          .otherwise(0.0))
      .groupBy("ta", "tb") // single group — the histogram is O(buckets)
      .agg(sum(col("term")).as("js_nats"))
      .select(col("ta").as("n_a"), col("tb").as("n_b"),
        // empty-side guard (see scaladoc): an undefined divergence is
        // NULL, never the NaN the 0/0 mixture would propagate
        when(col("ta") > 0 && col("tb") > 0, col("js_nats")).as("js_nats"))
  }
}
