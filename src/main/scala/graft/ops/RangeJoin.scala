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
    val widthSec: Column = lit(parseWidthSeconds(bucketWidth))

    def bucketOf(ts: Column): Column =
      floor(unix_timestamp(ts).cast("long") / widthSec).cast("long")

    val binnedPoints = points.withColumn("__bucket", bucketOf(col(pointTs)))
    val binnedIntervals = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(startTs)), bucketOf(col(endTs)))))

    binnedPoints
      .join(binnedIntervals, on :+ "__bucket")
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("__bucket")
  }
}
