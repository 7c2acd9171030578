package graft.ops

import graft.GraftSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KeepCanonicalSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("keeps the highest-quality member per cluster, min id on ties") {
    val docs = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.7), // chain cluster {1,2,3} → 2 wins
      (10L, 0.4), (11L, 0.4),          // tie cluster {10,11} → 10 wins
      (20L, 0.3)                       // singleton → survives as itself
    ).toDF("doc_id", "quality")
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.keepCanonical(docs, edges, "doc_id", "quality")
      .orderBy("component")
      .as[(Long, Long, Double, Long)].collect()
    assert(out === Array(
      (1L, 2L, 0.9, 3L),  // component label is the min id, winner is #2
      (10L, 10L, 0.4, 2L),
      (20L, 20L, 0.3, 1L)))
  }

  test("transitivity: the winner can sit two hops from the component label") {
    // chain a-b-c-d where the best quality is at the far end
    val docs = Seq((1L, 0.1), (2L, 0.2), (3L, 0.3), (4L, 0.8))
      .toDF("doc_id", "quality").repartition(3)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.keepCanonical(docs, edges, "doc_id", "quality")
      .as[(Long, Long, Double, Long)].collect()
    assert(out === Array((1L, 4L, 0.8, 4L)))
  }

  test("one row per cluster, exactly") {
    val rnd = new scala.util.Random(3)
    val docs = (1L to 100L).map(i => (i, rnd.nextDouble())).toDF("doc_id", "quality")
    // pair up consecutive ids: 50 clusters of 2
    val edges = (1L to 99L by 2).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.keepCanonical(docs, edges, "doc_id", "quality")
    assert(out.count() === 50)
    assert(out.select(sum("n_members")).as[Long].head() === 100L)
  }
}
