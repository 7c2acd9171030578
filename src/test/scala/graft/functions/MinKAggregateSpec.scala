package graft.functions

import graft.GraftSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MinKAggregateSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def sample = {
    val rnd = new scala.util.Random(7)
    (1 to 500).map(i => (s"g${rnd.nextInt(5)}", i.toLong))
  }

  test("minK equals the window row_number form on hashed keys") {
    val df = sample.toDF("g", "id").repartition(7)
      .withColumn("h", md5(col("id").cast("string")))
    val viaAgg = df.groupBy("g")
      .agg(MinKAggregate.minK(10, col("h"), col("id")).as("s"))
      .select(col("g"), posexplode(col("s")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("col.id").as("id"))
      .as[(String, Int, Long)].collect().toSet
    val w = Window.partitionBy("g").orderBy(col("h"), col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("g"), col("rn"), col("id"))
      .as[(String, Int, Long)].collect().toSet
    assert(viaAgg === viaWindow && viaAgg.nonEmpty)
  }

  test("groups smaller than k return all members, ordered") {
    val df = Seq(("a", 3L), ("a", 1L), ("b", 9L)).toDF("g", "id")
      .withColumn("h", md5(col("id").cast("string")))
    val out = df.groupBy("g")
      .agg(MinKAggregate.minK(10, col("h"), col("id")).as("s"))
      .select(col("g"), size(col("s")).as("n"))
      .as[(String, Int)].collect().toMap
    assert(out === Map("a" -> 2, "b" -> 1))
  }

  test("exact key ties break by ascending id and still cap at k") {
    val df = Seq.tabulate(6)(i => ("g", "same-key", i.toLong))
      .toDF("g", "h", "id").repartition(3)
    val out = df.groupBy("g")
      .agg(MinKAggregate.minK(4, col("h"), col("id")).as("s"))
      .select(explode(col("s")).as("x")).select("x.id")
      .as[Long].collect().toSeq
    assert(out === Seq(0L, 1L, 2L, 3L))
  }

  test("null keys and null ids are skipped, not sampled") {
    val df = Seq(
      (Some("k1"), Some(1L)), (None, Some(2L)), (Some("k3"), None)
    ).toDF("h", "id").withColumn("g", lit("g"))
    val out = df.groupBy("g")
      .agg(MinKAggregate.minK(5, col("h"), col("id")).as("s"))
      .select(explode(col("s")).as("x")).select("x.id")
      .as[Long].collect().toSeq
    assert(out === Seq(1L))
  }
}
