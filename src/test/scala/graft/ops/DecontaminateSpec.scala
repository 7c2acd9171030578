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

  test("masking removes exactly the leaked spans, in order") {
    val tr = Seq(
      (1L, "aa bb cc dd ee ff gg hh"), // leak "cc dd ee" → tokens 3..5 drop
      (2L, "totally clean training text right here") // untouched
    ).toDF("doc_id", "text")
    val ev = Seq((10L, "xx cc dd ee yy zz qq")).toDF("doc_id", "text")
    val out = Decontaminate.maskContaminated(tr, ev, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out === Array(
      (1L, "aa bb ff gg hh", 5L, 3L),
      (2L, "totally clean training text right here", 6L, 0L)))
  }

  test("overlapping and adjacent leaked grams merge into one masked span") {
    // eval contains "bb cc dd" AND "cc dd ee": occurrences at 2 and 3
    // cover positions 2..5 — union, not double-removal
    val tr = Seq((1L, "aa bb cc dd ee ff")).toDF("doc_id", "text")
    val ev = Seq((10L, "bb cc dd zz1 zz2 cc dd ee")).toDF("doc_id", "text")
    val out = Decontaminate.maskContaminated(tr, ev, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
    assert(out === Array((1L, "aa ff", 2L, 4L)))
  }

  test("a fully-leaked doc survives as an empty row, not a dropped one") {
    val tr = Seq((1L, "pp qq rr")).toDF("doc_id", "text")
    val ev = Seq((10L, "pp qq rr tail words here")).toDF("doc_id", "text")
    val out = Decontaminate.maskContaminated(tr, ev, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
    assert(out === Array((1L, "", 0L, 3L)))
  }

  test("masking leaves a disjoint corpus byte-identical") {
    val out = Decontaminate.maskContaminated(train,
        eval.filter("doc_id = 11"), "doc_id", "text")
      .orderBy("doc_id").select("clean_text").as[String].collect()
    assert(out === train.orderBy("doc_id").select("text").as[String].collect())
  }

  test("bloom-prefiltered masking is row-identical to the exact path") {
    val plain = Decontaminate.maskContaminated(train, eval, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    val bloomed = Decontaminate.maskContaminated(train, eval, "doc_id", "text",
        bloomPrefilter = true)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(bloomed === plain)
  }
}
