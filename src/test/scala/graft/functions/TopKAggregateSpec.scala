package graft.functions

import graft.GraftSpark
import graft.functions.TopKAggregate.{Scored, ScoredIn}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggregateSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def agg(k: Int) = new TopKAggregate.TopK(k)
  private def in(score: Double, id: Long) = ScoredIn(score, id)

  test("buffer never exceeds k, including exact ties with the last element") {
    val a = agg(2)
    val b = Seq(in(2.0, 3L), in(1.0, 5L), in(1.0, 6L), in(1.0, 4L))
      .foldLeft(a.zero)(a.reduce)
    assert(b.items.size == 2)
    assert(b.items == Seq(Scored(2.0, 3L), Scored(1.0, 4L)))
  }

  test("null scores/ids are skipped; NaN ranks first (window sort parity)") {
    val a = agg(2)
    val withNull = Seq(ScoredIn(null, 9L), ScoredIn(5.0, null), in(1.0, 1L))
      .foldLeft(a.zero)(a.reduce)
    assert(withNull.items == Seq(Scored(1.0, 1L)))
    // Spark sorts NaN greater than every double, so desc ranks it first —
    // the aggregator must agree with the window formulation
    val withNaN = Seq(in(Double.NaN, 7L), in(5.0, 2L))
      .foldLeft(a.zero)(a.reduce)
    assert(withNaN.items.head.id == 7L && withNaN.items.head.score.isNaN)
    assert(withNaN.items(1) == Scored(5.0, 2L))
  }

  test("merge respects the bound and ordering") {
    val a = agg(3)
    val left = Seq(in(5.0, 1L), in(3.0, 2L)).foldLeft(a.zero)(a.reduce)
    val right = Seq(in(4.0, 3L), in(6.0, 4L)).foldLeft(a.zero)(a.reduce)
    val m = a.merge(left, right)
    assert(m.items == Seq(Scored(6.0, 4L), Scored(5.0, 1L), Scored(4.0, 3L)))
  }

  test("DataFrame top-k equals the window formulation") {
    val df = Seq(
      ("a", 1.0, 1L), ("a", 3.0, 2L), ("a", 2.0, 3L), ("a", 3.0, 4L),
      ("b", 9.0, 5L)).toDF("g", "v", "id")
    val viaAgg = df.groupBy("g")
      .agg(TopKAggregate.topK(2, col("v"), col("id")).as("top"))
      .select(col("g"), explode(col("top")).as("s"))
      .select(col("g"), col("s.score"), col("s.id"))
      .orderBy("g", "id").collect().map(_.toSeq)
    assert(viaAgg.toSeq == Seq(
      Seq("a", 3.0, 2L), Seq("a", 3.0, 4L), Seq("b", 9.0, 5L)))
  }
}
