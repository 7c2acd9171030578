package graft.ops

import graft.GraftSpark
import org.scalatest.funsuite.AnyFunSuite

class GramSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("upperGramian equals the brute-force sum of outer products") {
    val vecs = Seq(
      Seq(1L, 2L, 3L),
      Seq(-4L, 5L, 0L),
      Seq(7L, -8L, 9L))
    val got = Gram.upperGramian(vecs.toDS(), dim = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val want = (for {
      i <- 0 until 3; j <- i until 3
    } yield (i, j) -> vecs.map(v => v(i) * v(j)).sum).toMap
    assert(got == want)
  }

  test("upperGramian is partition-count invariant (exact integer merge)") {
    val vecs = (1 to 97).map(k => Seq(k.toLong, (k % 7).toLong - 3, -k.toLong))
    val one = Gram.upperGramian(vecs.toDS().repartition(1), 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val many = Gram.upperGramian(vecs.toDS().repartition(13), 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(one == many)
  }

  test("empty partitions contribute nothing (no zero-row padding)") {
    val vecs = Seq(Seq(2L, 3L))
    val got = Gram.upperGramian(vecs.toDS().repartition(8), 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map((0, 0) -> 4L, (0, 1) -> 6L, (1, 1) -> 9L))
  }
}
