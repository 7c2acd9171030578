package graft.ops

import graft.GraftSpark
import org.scalatest.funsuite.AnyFunSuite

/** Specs for [[ExactSubstr]] — the Lee et al. 2022 substring-grain dedup
  * (duplicateSpans + removeDuplicateSpans) on hand fixtures where the
  * covered intervals are known by construction.
  */
class ExactSubstrSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def toks(s: String): Seq[String] = s.split(" ").toSeq

  test("duplicateSpans finds a shared run embedded mid-document") {
    // docs 1 and 2 share the 4-token run "a b c d" at different offsets;
    // everything else is unique
    val docs = Seq(
      (1L, toks("x1 x2 a b c d x3 x4")),
      (2L, toks("y1 a b c d y2 y3 y4 y5"))).toDF("doc_id", "toks")
    val got = ExactSubstr.duplicateSpans(docs, "doc_id", "toks", minLen = 4)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2, 6), (2L, 1, 5)))
  }

  test("duplicateSpans merges overlapping windows into one maximal span") {
    // a 6-token shared run with L=4 yields window starts {s, s+1, s+2}
    // that must coalesce into ONE [s, s+6) span, not three
    val docs = Seq(
      (1L, toks("p q a b c d e f r s")),
      (2L, toks("a b c d e f t u v w"))).toDF("doc_id", "toks")
    val got = ExactSubstr.duplicateSpans(docs, "doc_id", "toks", minLen = 4)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2, 8), (2L, 0, 6)))
  }

  test("duplicateSpans keeps disjoint repeats as separate spans") {
    // doc 1 shares run A with doc 2 and run B with doc 3, separated by
    // a unique gap longer than L — two spans, not one
    val docs = Seq(
      (1L, toks("a b c d g1 g2 g3 g4 g5 w x y z")),
      (2L, toks("a b c d m1 m2 m3 m4 m5 m6 m7 m8 m9")),
      (3L, toks("n1 n2 n3 n4 n5 n6 n7 n8 n9 w x y z"))).toDF("doc_id", "toks")
    val got = ExactSubstr.duplicateSpans(docs, "doc_id", "toks", minLen = 4)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 0, 4), (1L, 9, 13), (2L, 0, 4), (3L, 9, 13)))
  }

  test("duplicateSpans counts SAME-document repeats (Lee et al. semantics)") {
    // the run repeats within one document — still a duplicate
    val docs = Seq(
      (1L, toks("a b c d u1 u2 a b c d u3 u4 u5"))).toDF("doc_id", "toks")
    val got = ExactSubstr.duplicateSpans(docs, "doc_id", "toks", minLen = 4)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 0, 4), (1L, 6, 10)))
  }

  test("duplicateSpans ignores repeats shorter than L and docs shorter than L") {
    val docs = Seq(
      (1L, toks("a b c z1 z2 z3 z4")),
      (2L, toks("a b c w1 w2 w3 w4")),
      (3L, toks("a b"))).toDF("doc_id", "toks") // < L tokens: no window
    assert(ExactSubstr.duplicateSpans(docs, "doc_id", "toks", minLen = 4).count() == 0)
  }

  test("minOccurrences raises the duplication bar") {
    val docs = Seq(
      (1L, toks("a b c d k1 k2 k3 k4")),
      (2L, toks("a b c d k5 k6 k7 k8")),
      (3L, toks("m n o p a b c d q r"))).toDF("doc_id", "toks")
    // the run appears 3x: present at bar 3, absent at bar 4
    assert(ExactSubstr.duplicateSpans(docs, "doc_id", "toks", 4, minOccurrences = 3)
      .count() == 3)
    assert(ExactSubstr.duplicateSpans(docs, "doc_id", "toks", 4, minOccurrences = 4)
      .count() == 0)
  }

  test("removeDuplicateSpans cuts covered tokens and passes clean docs through") {
    val docs = Seq(
      (1L, toks("x1 x2 a b c d x3 x4")),
      (2L, toks("y1 a b c d y2 y3 y4 y5")),
      (3L, toks("u1 u2 u3 u4 u5 u6"))).toDF("doc_id", "toks")
    val got = ExactSubstr.removeDuplicateSpans(docs, "doc_id", "toks", minLen = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    assert(got.toSeq == Seq(
      (1L, toks("x1 x2 x3 x4")),
      (2L, toks("y1 y2 y3 y4 y5")),
      (3L, toks("u1 u2 u3 u4 u5 u6"))))
  }
}
