package graft.ops

import graft.GraftSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def randomDf(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong, rnd.nextInt(9).toLong, rnd.nextInt(1000).toLong))
      .toDF("id", "v", "key")
  }

  test("matches the single-window oracle on random data, any partitioning") {
    for ((seed, parts) <- Seq((3, 2), (17, 7), (29, 16))) {
      val df = randomDf(seed, 500)
      // total order: (key, id) — key alone has ties
      val got = PrefixSum.exclusive(df, Seq(col("key").asc, col("id").asc),
          col("v"), "cum", numPartitions = parts)
        .select("id", "cum").as[(Long, Long)].collect().toMap
      val want = df.withColumn("cum",
          coalesce(sum(col("v")).over(Window.orderBy(col("key").asc, col("id").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("id", "cum").as[(Long, Long)].collect().toMap
      assert(got == want, s"seed=$seed parts=$parts")
    }
  }

  test("exclusive semantics: first row 0, total is the grand sum") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
    val (out, total) = PrefixSum.exclusiveWithTotal(df, Seq(col("id")), col("v"))
    assert(total == 60L)
    assert(out.orderBy("id").select("id", "cum").as[(Long, Long)].collect()
      === Array((1L, 0L), (2L, 10L), (3L, 30L)))
  }

  test("descending sort columns order the running total correctly") {
    val df = Seq((1L, 1L), (2L, 2L), (3L, 4L)).toDF("id", "v")
    val out = PrefixSum.exclusive(df, Seq(col("id").desc), col("v"))
      .orderBy("id").select("id", "cum").as[(Long, Long)].collect()
    // order 3,2,1: cum(3)=0, cum(2)=4, cum(1)=6
    assert(out === Array((1L, 6L), (2L, 4L), (3L, 0L)))
  }

  test("per-group form matches the grouped-window oracle (groups span buckets)") {
    for ((seed, parts) <- Seq((5, 8), (19, 16))) {
      // 3 fat groups x ~170 rows over 8-16 range partitions: every group
      // spans several buckets, exercising the per-group offset rollup
      val rnd = new scala.util.Random(seed)
      val df = (1 to 500).map(i =>
          (i.toLong, s"g${rnd.nextInt(3)}", rnd.nextInt(7).toLong, rnd.nextInt(100).toLong))
        .toDF("id", "grp", "v", "key")
      val got = PrefixSum.exclusivePerGroup(df, Seq(col("grp")),
          Seq(col("key").asc, col("id").asc), col("v"), "cum", numPartitions = parts)
        .select("id", "cum").as[(Long, Long)].collect().toMap
      val want = df.withColumn("cum",
          coalesce(sum(col("v")).over(
            Window.partitionBy("grp").orderBy(col("key").asc, col("id").asc)
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("id", "cum").as[(Long, Long)].collect().toMap
      assert(got == want, s"seed=$seed parts=$parts")
    }
  }

  test("per-group form: single-row groups get 0; empty input is empty") {
    val df = Seq((1L, "a", 5L), (2L, "b", 7L)).toDF("id", "grp", "v")
    val out = PrefixSum.exclusivePerGroup(df, Seq(col("grp")), Seq(col("id")),
        col("v")).select("id", "cum").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L))
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "grp", "v")
    assert(PrefixSum.exclusivePerGroup(empty, Seq(col("grp")), Seq(col("id")),
      col("v")).count() == 0L)
  }

  test("empty input yields an empty frame and zero total") {
    val df = Seq.empty[(Long, Long)].toDF("id", "v")
    val (out, total) = PrefixSum.exclusiveWithTotal(df, Seq(col("id")), col("v"))
    assert(total == 0L && out.count() == 0L)
  }
}
