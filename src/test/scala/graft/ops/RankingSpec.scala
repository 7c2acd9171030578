package graft.ops

import graft.GraftSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  // scores with heavy ties (mod 7) force tie groups to be ranked
  // consistently; the doc id tiebreak makes the order total
  private def corpus(n: Int) = {
    val rnd = new scala.util.Random(7)
    (1 to n).map(i => (i.toLong, rnd.nextInt(7).toDouble)).toDF("id", "score")
  }

  test("globalRowNumber equals the single-partition window row_number") {
    val df = corpus(1000)
    val twoPhase = Ranking
      .globalRowNumber(df, Seq(col("score").desc, col("id").asc), numPartitions = 7)
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val window = df
      .withColumn("rn", row_number()
        .over(Window.orderBy(col("score").desc, col("id").asc)).cast("long"))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(twoPhase == window)
  }

  test("ntileExact equals the window ntile when n divides evenly") {
    val df = corpus(992) // 992 = 8 * 124
    assertNtileMatches(df, 8)
  }

  test("ntileExact equals the window ntile with a remainder") {
    val df = corpus(997) // 997 mod 8 = 5 → first 5 buckets one larger
    assertNtileMatches(df, 8)
  }

  test("ntileExact with fewer rows than buckets: one row per bucket") {
    val df = corpus(5)
    assertNtileMatches(df, 8)
  }

  test("cumeDistExact equals the global window cume_dist, ties included") {
    // no id tiebreak on purpose: peer groups of ~143 rows each exercise
    // the peer-inclusive frame across partition boundaries
    val df = corpus(1000)
    val twoPhase = Ranking
      .cumeDistExact(df, Seq(col("score").desc), numPartitions = 7)
      .select("id", "cume_dist").as[(Long, Double)].collect().toMap
    val window = df
      .withColumn("cume_dist", cume_dist()
        .over(Window.orderBy(col("score").desc)))
      .select("id", "cume_dist").as[(Long, Double)].collect().toMap
    assert(twoPhase == window)
  }

  test("cumeDistExact of a single row is 1.0") {
    val df = Seq((1L, 9.0)).toDF("id", "v")
    val out = Ranking.cumeDistExact(df, Seq(col("v").asc))
      .select("cume_dist").as[Double].collect()
    assert(out.toSeq == Seq(1.0))
  }

  private def assertNtileMatches(df: org.apache.spark.sql.DataFrame, b: Int): Unit = {
    val twoPhase = Ranking
      .ntileExact(df, b, Seq(col("score").desc, col("id").asc), numPartitions = 7)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    val window = df
      .withColumn("bucket", ntile(b)
        .over(Window.orderBy(col("score").desc, col("id").asc)).cast("long"))
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(twoPhase == window)
  }
}
