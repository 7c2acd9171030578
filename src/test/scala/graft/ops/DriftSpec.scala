package graft.ops

import graft.GraftSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DriftSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def js(a: Seq[Double], b: Seq[Double], width: Double = 1.0): Double =
    Drift.jsDivergence(a.toDF("v"), b.toDF("v"), col("v"), width)
      .select("js_nats").as[Double].head()

  test("identical distributions have zero divergence, exactly") {
    val xs = Seq(0.5, 1.5, 1.6, 2.5, 2.5, 7.0)
    // p == q on every bucket -> every ln(p/m) = ln(1) = 0, no float slack
    assert(js(xs, xs) == 0.0)
  }

  test("disjoint supports reach the ln 2 maximum") {
    val a = Seq(0.1, 0.2, 1.1, 1.9)
    val b = Seq(10.1, 11.5, 12.2)
    assert(math.abs(js(a, b) - math.log(2.0)) < 1e-12)
  }

  test("divergence is symmetric and within [0, ln 2]") {
    val rnd = new scala.util.Random(11)
    val a = Seq.fill(300)(rnd.nextDouble() * 10)
    val b = Seq.fill(200)(rnd.nextDouble() * 14)
    val ab = js(a, b); val ba = js(b, a)
    assert(math.abs(ab - ba) < 1e-12)
    assert(ab >= 0.0 && ab <= math.log(2.0) + 1e-12)
  }

  test("hand-checked two-bucket value") {
    // a: 3 in bucket0, 1 in bucket1; b: 1 in bucket0, 3 in bucket1
    val a = Seq(0.1, 0.2, 0.3, 1.1)
    val b = Seq(0.4, 1.2, 1.3, 1.4)
    val p = Seq(0.75, 0.25); val q = Seq(0.25, 0.75)
    val want = p.zip(q).map { case (pi, qi) =>
      val m = (pi + qi) / 2
      pi * math.log(pi / m) / 2 + qi * math.log(qi / m) / 2
    }.sum
    assert(math.abs(js(a, b) - want) < 1e-12)
    // counts surface alongside the divergence
    val row = Drift.jsDivergence(a.toDF("v"), b.toDF("v"), col("v"), 1.0)
      .select("n_a", "n_b").as[(Long, Long)].head()
    assert(row == ((4L, 4L)))
  }

  test("one empty snapshot yields NULL divergence (not NaN), counts intact") {
    val a = Seq(0.1, 1.2, 2.3)
    val empty = Seq.empty[Double]
    Seq((a, empty, (3L, 0L)), (empty, a, (0L, 3L))).foreach {
      case (l, r, want) =>
        val row = Drift.jsDivergence(l.toDF("v"), r.toDF("v"), col("v"), 1.0)
          .select("n_a", "n_b", "js_nats").head()
        assert((row.getLong(0), row.getLong(1)) == want)
        assert(row.isNullAt(2), s"js_nats should be NULL, got ${row.get(2)}")
    }
  }

  test("both snapshots empty yields zero rows") {
    val empty = Seq.empty[Double]
    assert(Drift.jsDivergence(empty.toDF("v"), empty.toDF("v"), col("v"), 1.0)
      .count() == 0L)
  }
}
