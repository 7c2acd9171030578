package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match point rows to interval rows
  * with `start <= point <= end` (plus optional equality keys) — the second
  * time-series join shape Spark lacks natively.
  *
  * A naive theta-join plans as BroadcastNestedLoop/Cartesian — O(n·m) and
  * a non-starter at scale. This implementation bins time into fixed-width
  * buckets: intervals explode into the buckets they overlap, points map to
  * exactly one bucket, and the join becomes an equi-join on
  * (keys..., bucket) followed by the exact containment filter. Cost is
  * O(n + m·spread) shuffle rows, where spread = avg interval width /
  * bucket width — pick `bucketWidth` near the typical interval length.
  */
object RangeJoin {

  private[ops] def parseWidthSeconds(width: String): Long = {
    val Array(n, unit) = width.trim.split("\\s+")
    val mult = unit.toLowerCase.stripSuffix("s") match {
      case "second" => 1L
      case "minute" => 60L
      case "hour"   => 3600L
      case "day"    => 86400L
      case u        => throw new IllegalArgumentException(s"unsupported unit: $u")
    }
    n.toLong * mult
  }

  /** The one bucketing formula both join ops share — epoch seconds
    * floor-divided into fixed-width bins.
    */
  private def bucketOf(widthSec: Column)(ts: Column): Column =
    floor(unix_timestamp(ts).cast("long") / widthSec).cast("long")

  /** @param points      point-side frame
    * @param intervals   interval-side frame
    * @param on          equality key columns present on both sides
    * @param pointTs     point timestamp column
    * @param startTs     interval start column
    * @param endTs       interval end column (inclusive)
    * @param bucketWidth bucket width, e.g. "1 hour" — tune to the typical
    *                    interval length
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      on: Seq[String],
      pointTs: String,
      startTs: String,
      endTs: String,
      bucketWidth: String = "1 hour"): DataFrame = {
    val bucket = bucketOf(lit(parseWidthSeconds(bucketWidth))) _

    val binnedPoints = points.withColumn("__bucket", bucket(col(pointTs)))
    val binnedIntervals = intervals.withColumn("__bucket",
      explode(sequence(bucket(col(startTs)), bucket(col(endTs)))))

    binnedPoints
      .join(binnedIntervals, on :+ "__bucket")
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("__bucket")
  }

  /** Interval×interval overlap join: pairs where
    * `leftStart <= rightEnd && rightStart <= leftEnd` (inclusive overlap),
    * plus equality keys — the both-sides-are-intervals sibling of
    * [[pointInInterval]], same anti-nested-loop construction.
    *
    * Both sides explode into the fixed-width buckets they span and meet on
    * an equi-join key of (keys..., bucket). An overlapping pair meets in
    * EVERY shared bucket, so the join would duplicate it; the pair is kept
    * only in its canonical bucket — the one containing the overlap's start
    * `max(leftStart, rightStart)` — which exists for every true overlap
    * and is unique. Cost is O((n + m)·spread) shuffle rows; pick
    * `bucketWidth` near the typical interval length.
    *
    * The start/end column names must differ between the two sides (rename
    * before calling — the result carries both quadruples).
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      bucketWidth: String = "1 hour"): DataFrame = {
    require(Set(leftStart, leftEnd, rightStart, rightEnd).size == 4,
      "interval column names must be distinct across sides")
    val bucket = bucketOf(lit(parseWidthSeconds(bucketWidth))) _

    val a = left.withColumn("__bucket",
      explode(sequence(bucket(col(leftStart)), bucket(col(leftEnd)))))
    val b = right.withColumn("__bucket",
      explode(sequence(bucket(col(rightStart)), bucket(col(rightEnd)))))
    a.join(b, on :+ "__bucket")
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      // canonical-bucket dedup: each true overlap survives exactly once
      .filter(col("__bucket") ===
        bucket(greatest(col(leftStart), col(rightStart))))
      .drop("__bucket")
  }
}
