package graft.ops

import graft.GraftSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, 100L, ts("2024-01-01 10:00:05")),
    (2L, 100L, ts("2024-01-01 10:01:00")),
    (3L, 200L, ts("2024-01-01 10:00:00")),
    (4L, 300L, ts("2024-01-01 10:00:00")))
    .toDF("trade_id", "inst", "ts")

  private lazy val quotes = Seq(
    (100L, ts("2024-01-01 10:00:00"), 10.0),
    (100L, ts("2024-01-01 10:00:30"), 11.0),
    (200L, ts("2024-01-01 10:00:00"), 20.0),  // equal instant → matches
    (300L, ts("2024-01-01 12:00:00"), 30.0))  // only AFTER the trade
    .toDF("inst", "q_ts", "price")

  test("asof picks the latest right row at or before each left row") {
    val r = AsOfJoin.asof(trades, quotes, Seq("inst"), "ts", "q_ts", Seq("price"))
      .orderBy("trade_id").collect()
    assert(r(0).getAs[Double]("price") == 10.0)   // 10:00:05 → 10:00:00 quote
    assert(r(1).getAs[Double]("price") == 11.0)   // 10:01:00 → 10:00:30 quote
    assert(r(2).getAs[Double]("price") == 20.0)   // equal instant included
    assert(r(3).isNullAt(r(3).fieldIndex("price"))) // no quote before → null
    assert(r(0).getAs[java.sql.Timestamp]("asof_ts") == ts("2024-01-01 10:00:00"))
  }

  test("a null in the matched row's carried column stays null (no stitching)") {
    // most recent quote for inst 100 at 10:01 has price=null, size=7; a
    // per-column fill would resurrect price=11.0 from the OLDER 10:00:30
    // row — a row that never existed
    val quotesWithNull = Seq(
      (100L, ts("2024-01-01 10:00:30"), Option(11.0), Option(5L)),
      (100L, ts("2024-01-01 10:00:50"), None, Option(7L)))
      .toDF("inst", "q_ts", "price", "qsize")
    val left = Seq((1L, 100L, ts("2024-01-01 10:01:00")))
      .toDF("trade_id", "inst", "ts")
    val r = AsOfJoin.asof(left, quotesWithNull, Seq("inst"), "ts", "q_ts",
        Seq("price", "qsize")).head()
    assert(r.isNullAt(r.fieldIndex("price")))
    assert(r.getAs[Long]("qsize") == 7L)
    assert(r.getAs[java.sql.Timestamp]("asof_ts") == ts("2024-01-01 10:00:50"))
  }

  test("tolerance nulls out matches older than the horizon") {
    val r = AsOfJoin.asof(trades, quotes, Seq("inst"), "ts", "q_ts", Seq("price"),
        tolerance = Some(expr("INTERVAL 10 SECONDS")))
      .orderBy("trade_id").collect()
    assert(r(0).getAs[Double]("price") == 10.0)   // 5s old — within
    assert(r(1).isNullAt(r(1).fieldIndex("price"))) // 30s old — beyond
  }

  test("forward direction picks the earliest right row at or after each left row") {
    val r = AsOfJoin.asof(trades, quotes, Seq("inst"), "ts", "q_ts", Seq("price"),
        direction = "forward")
      .orderBy("trade_id").collect()
    assert(r(0).getAs[Double]("price") == 11.0)   // 10:00:05 → next is 10:00:30
    assert(r(1).isNullAt(r(1).fieldIndex("price"))) // nothing after 10:01
    assert(r(2).getAs[Double]("price") == 20.0)   // equal instant included
    assert(r(3).getAs[Double]("price") == 30.0)   // the only-after quote now matches
  }

  test("forward tolerance bounds the wait ahead") {
    val r = AsOfJoin.asof(trades, quotes, Seq("inst"), "ts", "q_ts", Seq("price"),
        tolerance = Some(expr("INTERVAL 30 SECONDS")), direction = "forward")
      .orderBy("trade_id").collect()
    assert(r(0).getAs[Double]("price") == 11.0)   // 25s ahead — within
    assert(r(3).isNullAt(r(3).fieldIndex("price"))) // 2h ahead — beyond
  }

  test("nearest picks the closer side and prefers backward on exact ties") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:10")),  // back 10s, fwd 20s → back
      (2L, 100L, ts("2024-01-01 10:00:25")),  // back 25s, fwd 5s  → fwd
      (3L, 100L, ts("2024-01-01 10:00:15")))  // back 15s, fwd 15s → TIE → back
      .toDF("trade_id", "inst", "ts")
    val r = AsOfJoin.asof(left, quotes, Seq("inst"), "ts", "q_ts", Seq("price"),
        direction = "nearest")
      .orderBy("trade_id").collect()
    assert(r(0).getAs[Double]("price") == 10.0)
    assert(r(1).getAs[Double]("price") == 11.0)
    assert(r(2).getAs[Double]("price") == 10.0)
  }

  test("nearest respects tolerance on BOTH sides") {
    val left = Seq((1L, 300L, ts("2024-01-01 10:00:00"))) // fwd match 2h ahead
      .toDF("trade_id", "inst", "ts")
    val r = AsOfJoin.asof(left, quotes, Seq("inst"), "ts", "q_ts", Seq("price"),
        tolerance = Some(expr("INTERVAL 1 HOUR")), direction = "nearest").head()
    assert(r.isNullAt(r.fieldIndex("price")))
  }
}
