package graft.functions

import graft.GraftSpark
import graft.functions.expressions.JaroWinklerSim
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JaroWinklerSim pinned to the DuckDB oracle's dialect: every expected
  * value below is the EXACT double `jaro_winkler_similarity` returns
  * (probed against DuckDB 1.0 — q429's oracle engine), including the
  * two spots where dialects legitimately diverge: floored
  * half-transpositions (Commons-Text uses fractional) and
  * both-empty -> 0.0 (Commons-Text returns 1.0).
  */
class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double = JaroWinklerSim.similarity(a, b)

  test("textbook vectors match DuckDB bit-for-bit") {
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("jellyfish", "smellyfish") == 0.8962962962962964)
  }

  test("floored half-transpositions (the DuckDB/strcmp95 dialect)") {
    // 4 matches, 3 out-of-order positions: t = 3/2 = 1 (floored), so
    // jaro = (0.4 + 0.4 + 3/4) / 3. Fractional t would give 0.475.
    assert(jw("small bolt", "cold anvil") == 0.5166666666666667)
  }

  test("boost fires only above jaro 0.7; prefix cap is 4") {
    assert(jw("abcdefgh", "abzzzzzz") == 0.5) // jaro 0.5, prefix 2: no boost
    assert(jw("aaaaaaaaaa", "aaaaazzzzz") == 0.6666666666666666) // 0.667: no boost
    // jaro 0.7333 with a 6-char common prefix: boost uses min(4, l)
    assert(jw("aaaaaazzzz", "aaaaaayyyy") == 0.8400000000000001)
  }

  test("edge cases: empty sides, window-zero transposals, identity") {
    assert(jw("", "") == 0.0) // DuckDB convention (Commons-Text: 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0: no cross-position matches
    assert(jw("a", "a") == 1.0)
    assert(jw("same string", "same string") == 1.0)
  }

  test("symmetry and range on random pairs") {
    val rnd = new scala.util.Random(11)
    val alph = "abcdef "
    (1 to 500).foreach { _ =>
      val a = (1 to rnd.nextInt(12)).map(_ => alph(rnd.nextInt(alph.length))).mkString.trim
      val b = (1 to rnd.nextInt(12)).map(_ => alph(rnd.nextInt(alph.length))).mkString.trim
      val s = jw(a, b)
      assert(s == jw(b, a), s"asymmetric on ($a, $b)")
      assert(s >= 0.0 && s <= 1.0, s"out of range on ($a, $b)")
    }
  }

  test("Column form: nulls propagate, values match the scalar") {
    val df = Seq((Option("martha"), Option("marhta")),
        (None: Option[String], Option("x")),
        (Option("red widget"), Option("red widgets")))
      .toDF("a", "b")
      .select(JaroWinklerSim.column(col("a"), col("b")).as("s"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 0.9611111111111111)
    assert(rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) == 0.9818181818181818)
  }

  test("stays inside whole-stage codegen on a parquet-backed frame") {
    val plan = graft.Tables.load(spark, "/root/testdata/sf0.001", "part")
      .select(JaroWinklerSim.column(col("p_name"), col("p_brand")).as("s"))
      .queryExecution.executedPlan.toString()
    val line = plan.linesIterator.find(_.contains("jaro_winkler"))
    assert(line.exists(_.contains("*(")), plan)
  }
}
