package graft.ops

import graft.GraftSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  // zipf-ish stream: item i appears ~5000/i times over a 200-item
  // vocabulary — heavy head, long tail
  private def zipf = (1 to 200).flatMap(i => Seq.fill(5000 / i)(s"item_$i"))

  test("heavyHitters equals the exact GROUP BY ... HAVING query") {
    val df = scala.util.Random.shuffle(zipf).toDF("item").repartition(7)
    val mg = HeavyHitters.heavyHitters(df, col("item"), minCount = 500)
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("item").count()
      .filter(col("count") >= 500)
      .as[(String, Long)].collect().toMap
    assert(mg == exact && exact.nonEmpty)
  }

  test("candidate summary is a superset of the true heavy hitters") {
    val df = scala.util.Random.shuffle(zipf).toDF("item").repartition(7)
    val n = df.count()
    val minCount = 1000L
    val k = (n / minCount + 1).toInt
    val cands = HeavyHitters.candidates(df, col("item"), k)
      .as[String].collect().toSet
    assert(cands.size <= k)
    val trueHeavy = df.groupBy("item").count()
      .filter(col("count") > n / k).as[(String, Long)].collect().map(_._1).toSet
    assert(trueHeavy.subsetOf(cands), s"missing: ${trueHeavy -- cands}")
  }

  test("null items are excluded from both the result and the sizing count") {
    val df = (Seq.fill(600)(Option("a")) ++ Seq.fill(600)(Option.empty[String]) ++
      Seq.fill(10)(Option("b"))).toDF("item")
    val out = HeavyHitters.heavyHitters(df, col("item"), minCount = 500)
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 600L)) // no null group, no null-inflated k
  }

  test("a too-low threshold fails fast instead of silently dropping items") {
    val df = Seq.fill(100000)("x").toDF("item")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(df, col("item"), minCount = 1, maxSummarySize = 64)
    }
    assert(e.getMessage.contains("summary"))
  }
}
