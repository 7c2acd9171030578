package graft.ops

import graft.GraftSpark
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val filler = (1 to 30).map(i => s"w$i").mkString(" ")
  private lazy val train = Seq(
    (1L, s"the quick brown fox jumps $filler"),
    (2L, s"completely different training text here $filler")).toDF("doc_id", "text")
  private lazy val eval = Seq(
    (10L, "the quick brown fox sleeps all day in other words"), // shares "the quick brown" etc
    (11L, "nothing in common with anything at all whatsoever")).toDF("doc_id", "text")

  test("flags eval docs sharing grams with train; clean docs absent") {
    val c = Decontaminate.contaminated(train, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c.contains(10L) && c(10L) >= 2)
    assert(!c.contains(11L))
  }

  test("hashed-gram fast path returns the same result as the string path") {
    val exact = Decontaminate.contaminated(train, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hashed = Decontaminate.contaminated(train, eval, "doc_id", "text",
        hashGrams = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact == hashed)
  }

  test("bloom-prefiltered path returns the same result as the plain path") {
    val exact = Decontaminate.contaminated(train, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloomed = Decontaminate.contaminatedBloom(train, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact == bloomed && bloomed.nonEmpty)
  }

  test("bloom path with an empty train split reports no contamination") {
    val emptyTrain = train.filter("doc_id < 0")
    assert(Decontaminate.contaminatedBloom(emptyTrain, eval, "doc_id", "text")
      .count() == 0L)
  }
}
