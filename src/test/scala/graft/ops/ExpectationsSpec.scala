package graft.ops

import graft.GraftSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpectationsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._
  import Expectations.Rule

  private val df = Seq(
    (1L, Some(5.0), "A"),
    (2L, Some(-1.0), "B"),  // violates positive
    (3L, None, "A"),        // NULL predicate result → violation
    (4L, Some(2.0), "Z")    // violates domain
  ).toDF("id", "v", "flag")

  test("counts violations per rule in one pass; NULL results violate") {
    val out = Expectations.check(df, Seq(
        Rule("v_positive", col("v") > 0),
        Rule("flag_domain", col("flag").isin("A", "B")),
        Rule("id_present", col("id").isNotNull)))
      .orderBy("rule")
      .as[(String, Long, Long, Double)].collect()
    assert(out === Array(
      ("flag_domain", 4L, 1L, 0.25),
      ("id_present", 4L, 0L, 0.0),
      ("v_positive", 4L, 2L, 0.5))) // -1 and the NULL both violate
  }

  test("single scan regardless of rule count") {
    val plan = Expectations.check(df, Seq(
        Rule("a", col("v") > 0), Rule("b", col("flag") === "A"),
        Rule("c", col("id") < 100)))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Scan")) <= 1, plan)
  }

  test("enforce throws on violations above tolerance, passes below") {
    val e = intercept[IllegalArgumentException] {
      Expectations.enforce(df, Seq(Rule("v_positive", col("v") > 0)))
    }
    assert(e.getMessage.contains("v_positive"))
    // 50% violation rate is fine under a 0.6 tolerance
    val report = Expectations.enforce(df,
      Seq(Rule("v_positive", col("v") > 0)), tolerance = 0.6)
    assert(report.count() === 1)
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.check(df, Seq(Rule("x", col("v") > 0), Rule("x", col("v") < 9)))
    }
  }

  test("foreignKey counts orphans; duplicate parent keys don't multiply") {
    import spark.implicits._
    val child = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "x"))
      .toDF("fk_id", "payload")
    // parent key 1 duplicated: left_anti must not double-count matches
    val parent = Seq(1L, 1L, 2L, 3L).toDF("id")
    val row = Expectations.foreignKey("t", child, "fk_id", parent, "id")
      .collect()(0)
    assert(row.getString(0) == "t")
    assert(row.getLong(1) == 4L && row.getLong(2) == 1L)
    assert(row.getDouble(3) == 0.25)
  }

  test("foreignKey with zero orphans reports a 0.0 rate") {
    import spark.implicits._
    val child = Seq(1L, 2L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("k2")
    val row = Expectations.foreignKey("ok", child, "k", parent, "k2")
      .collect()(0)
    assert(row.getLong(2) == 0L && row.getDouble(3) == 0.0)
  }

  test("foreignKey: NULL child keys are 'no reference', not orphans") {
    import spark.implicits._
    val child = Seq(Some(1L), None, None).toDF("k")
    val parent = Seq(1L).toDF("k2")
    val row = Expectations.foreignKey("opt", child, "k", parent, "k2")
      .collect()(0)
    assert(row.getLong(1) == 3L, "n_child counts all rows")
    assert(row.getLong(2) == 0L, "NULL keys must not count as orphans")
  }

  test("foreignKey on an empty child reports rate 0.0, never NaN-as-zero") {
    import spark.implicits._
    val child = Seq.empty[Long].toDF("k")
    val parent = Seq(1L).toDF("k2")
    val row = Expectations.foreignKey("empty", child, "k", parent, "k2")
      .collect()(0)
    assert(row.getLong(1) == 0L && row.getLong(2) == 0L)
    assert(row.getDouble(3) == 0.0 && !row.getDouble(3).isNaN)
  }
}
