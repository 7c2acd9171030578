package graft.functions

import graft.GraftSpark
import graft.functions.TopKAggregate.{Scored, TopKBuf}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggregateSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def agg(k: Int) = new TopKAggregate.TopK(k)

  test("buffer never exceeds k, including exact ties with the last element") {
    val a = agg(2)
    val b = Seq(Scored(2.0, 3L), Scored(1.0, 5L), Scored(1.0, 6L), Scored(1.0, 4L))
      .foldLeft(a.zero)(a.reduce)
    assert(b.items.size == 2)
    assert(b.items == Seq(Scored(2.0, 3L), Scored(1.0, 4L)))
  }

  test("NaN scores are dropped, not accumulated") {
    val a = agg(2)
    val b = (1 to 10).map(i => Scored(Double.NaN, i.toLong))
      .foldLeft(a.reduce(a.zero, Scored(1.0, 1L)))(a.reduce)
    assert(b.items == Seq(Scored(1.0, 1L)))
  }

  test("merge respects the bound and ordering") {
    val a = agg(3)
    val left = Seq(Scored(5.0, 1L), Scored(3.0, 2L)).foldLeft(a.zero)(a.reduce)
    val right = Seq(Scored(4.0, 3L), Scored(6.0, 4L)).foldLeft(a.zero)(a.reduce)
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
