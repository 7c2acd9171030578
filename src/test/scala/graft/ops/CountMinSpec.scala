package graft.ops

import graft.GraftSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CountMinSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  // zipf-ish: item i appears ~3000/i times
  private def zipf = (1 to 100).flatMap(i => Seq.fill(3000 / i)(s"w$i"))
  private def exactCounts = zipf.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("estimates never undercount and respect the eps*N bound") {
    val df = scala.util.Random.shuffle(zipf).toDF("item").repartition(7)
    val depth = 5; val width = 2048
    val sk = CountMin.sketch(df, col("item"), depth, width)
    val n = zipf.size.toLong
    val epsN = math.ceil(math.E / width * n).toLong
    exactCounts.foreach { case (item, exact) =>
      val est = CountMin.estimate(sk, item, depth, width, seed = 42)
      assert(est >= exact, s"$item undercounted: $est < $exact")
      // Markov bound per row, depth rows: overflow beyond eps*N for ALL
      // rows is ~e^-depth; with depth=5 a single violation over 100 items
      // would be a soft failure — assert the hard one-sided bound loosely
      assert(est <= exact + 3 * epsN, s"$item wildly overcounted: $est vs $exact")
    }
  }

  test("sketch is merge-invariant: partitioning must not change it") {
    val data = scala.util.Random.shuffle(zipf).toDF("item")
    val a = CountMin.sketch(data.repartition(1), col("item"))
    val b = CountMin.sketch(data.repartition(13), col("item"))
    assert(a.toSeq === b.toSeq)
  }

  test("heavyProbes equals the exact filtered HAVING query") {
    val df = scala.util.Random.shuffle(zipf).toDF("item").repartition(7)
    val probes = Seq("w1", "w2", "w30", "w99", "absent")
    val got = CountMin.heavyProbes(df, col("item"), probes, minCount = 100L)
      .as[(String, Long)].collect().toMap
    val expected = exactCounts.view
      .filterKeys(probes.contains).filter(_._2 >= 100L).toMap
    assert(got === expected && got.nonEmpty)
  }

  test("no surviving probe yields an empty, well-typed result") {
    val df = Seq("a", "b").toDF("item")
    val out = CountMin.heavyProbes(df, col("item"), Seq("zz"), minCount = 10L)
    assert(out.columns.toSeq === Seq("item", "n") && out.count() === 0)
  }

  test("null items are skipped like COUNT(col)") {
    val df = (Seq.fill(50)(Option("x")) ++ Seq.fill(50)(Option.empty[String]))
      .toDF("item")
    val sk = CountMin.sketch(df, col("item"), depth = 4, width = 64)
    assert(CountMin.estimate(sk, "x", 4, 64, 42) === 50L)
    assert(sk.sum === 4L * 50) // exactly depth increments per non-null row
  }
}
