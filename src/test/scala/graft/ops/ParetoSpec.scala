package graft.ops

import graft.GraftSpark
import org.scalatest.funsuite.AnyFunSuite

class ParetoSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  /** Naive O(n^2) skyline with duplicate collapse: keep a point iff no
    * other point strictly dominates it AND no earlier-tie exact (x,y)
    * duplicate exists.
    */
  private def naive(pts: Seq[(String, Int, Double, Long)]): Set[(String, Int, Double, Long)] =
    pts.filter { case (g, x, y, id) =>
      !pts.exists { case (g2, x2, y2, id2) =>
        g2 == g && ((x2 <= x && y2 <= y && (x2 < x || y2 < y)) ||
          (x2 == x && y2 == y && id2 < id))
      }
    }.toSet

  test("frontier2d equals the naive dominance skyline on random points") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 200L).map(i =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(20), rnd.nextInt(30).toDouble, i))
    val df = pts.toDF("g", "x", "y", "id")
    val got = Pareto.frontier2d(df, Seq("g"), "x", "y", "id")
      .as[(String, Int, Double, Long)].collect().toSet
    assert(got == naive(pts))
  }

  test("frontier keeps exactly one representative of exact duplicates") {
    val df = Seq(("a", 1, 5.0, 1L), ("a", 1, 5.0, 2L), ("a", 2, 4.0, 3L))
      .toDF("g", "x", "y", "id")
    val got = Pareto.frontier2d(df, Seq("g"), "x", "y", "id")
      .as[(String, Int, Double, Long)].collect().toSet
    assert(got == Set(("a", 1, 5.0, 1L), ("a", 2, 4.0, 3L)))
  }

  test("NULL coordinates are excluded: never frontier members, never dominators") {
    val df = Seq(
      (Option.empty[Int], Some(1.0), 1L), // NULL x would poison the running min
      (Some(5), Some(2.0), 2L),
      (Some(6), Option.empty[Double], 3L)) // NULL y is incomparable
      .toDF("x", "y", "id").withColumn("g", org.apache.spark.sql.functions.lit("a"))
    val got = Pareto.frontier2d(df, Seq("g"), "x", "y", "id")
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L))
  }

  test("a single point and a fully dominated chain behave") {
    val df = Seq(("a", 1, 1.0, 1L), ("a", 2, 2.0, 2L), ("a", 3, 3.0, 3L),
      ("b", 9, 9.0, 4L)).toDF("g", "x", "y", "id")
    val got = Pareto.frontier2d(df, Seq("g"), "x", "y", "id")
      .as[(String, Int, Double, Long)].collect().toSet
    assert(got == Set(("a", 1, 1.0, 1L), ("b", 9, 9.0, 4L)))
  }
}
