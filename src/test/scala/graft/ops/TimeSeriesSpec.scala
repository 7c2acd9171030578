package graft.ops

import graft.GraftSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def ts(hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-01 $hour%02d:00:00")

  test("gap fill densifies each key's own range and forward-fills") {
    val series = Seq(
      ("a", ts(0), 1.0), ("a", ts(1), 2.0), ("a", ts(4), 5.0), // gaps at 2,3
      ("b", ts(10), 7.0) // single point, no spine beyond itself
    ).toDF("k", "hour", "v").repartition(3)
    val out = TimeSeries.gapFillForwardFill(series, "k", "hour", "v")
      .orderBy("k", "hour")
      .select(col("k"), hour(col("hour")).as("h"), col("v"), col("was_gap"))
      .as[(String, Int, Double, Boolean)].collect()
    assert(out === Array(
      ("a", 0, 1.0, false), ("a", 1, 2.0, false),
      ("a", 2, 2.0, true), ("a", 3, 2.0, true), ("a", 4, 5.0, false),
      ("b", 10, 7.0, false)))
  }

  test("gap fill never invents rows outside a key's [min, max]") {
    val series = Seq(("x", ts(5), 1.0), ("x", ts(7), 2.0)).toDF("k", "hour", "v")
    val hours = TimeSeries.gapFillForwardFill(series, "k", "hour", "v")
      .select(hour(col("hour"))).as[Int].collect().sorted
    assert(hours === Array(5, 6, 7))
  }

  test("rollingSumCount matches a brute-force trailing-window computation") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { i =>
      (i.toLong, s"u${rnd.nextInt(6)}", rnd.nextInt(10000).toLong,
        rnd.nextInt(500).toLong)
    }
    val df = rows.toDF("id", "k", "t", "c").repartition(5)
    val got = TimeSeries.rollingSumCount(df, "k", "t", col("c"), lookback = 1000L)
      .select(col("id"), col("win_sum"), col("win_n"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // brute force: peers on t are all included (RANGE semantics)
    val expected = rows.map { case (id, k, t, _) =>
      val in = rows.filter(r => r._2 == k && r._3 >= t - 1000 && r._3 <= t)
      id -> (in.map(_._4).sum, in.size.toLong)
    }.toMap
    assert(got === expected)
  }

  test("rollingSumCount rejects a non-positive lookback") {
    val df = Seq((1L, "k", 0L, 1L)).toDF("id", "k", "t", "c")
    intercept[IllegalArgumentException] {
      TimeSeries.rollingSumCount(df, "k", "t", col("c"), lookback = 0L)
    }
  }
}
