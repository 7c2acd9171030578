package graft.ops

import graft.GraftSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[AsOfJoin.asofAuto]]'s dispatch contract: the surface it picks is a
  * purely physical choice — output is cell-identical to every manual
  * surface — and the pick follows the documented rules (size threshold
  * → broadcast, oversize → merge exec, nearest → window form,
  * complex-typed carry → merge exec).
  */
class AsOfAutoSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def events = graft.Tables.load(spark, sf, "events")

  private def clicks = events.filter(col("event_type") === "click")
    .select("event_id", "user_id", "ts")
  private def purchases = events.filter(col("event_type") === "purchase")
    .groupBy(col("user_id"), col("ts").as("p_ts"))
    .agg(max(col("value")).as("p_value"))
    .select("user_id", "p_ts", "p_value")

  private val cols = Seq("event_id", "user_id", "ts", "p_value", "asof_ts")

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq

  private def autoAt(thresholdBytes: Long,
      direction: String = "backward",
      tolMicros: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    spark.conf.set("graft.asof.broadcastThreshold", thresholdBytes.toString)
    try AsOfJoin.asofAuto(clicks, purchases, on = Seq("user_id"),
      leftTs = "ts", rightTs = "p_ts", rightCols = Seq("p_value"),
      direction = direction, toleranceMicros = tolMicros)
    finally spark.conf.unset("graft.asof.broadcastThreshold")
  }

  test("three-way parity: auto == broadcast == merge == window, both dirs") {
    for (dir <- Seq("backward", "forward")) {
      val auto = rowsOf(autoAt(1L << 30, dir))
      val bc = rowsOf(AsOfJoin.asofBroadcast(clicks, purchases,
        on = Seq("user_id"), leftTs = "ts", rightTs = "p_ts",
        rightCols = Seq("p_value"), direction = dir))
      val mg = rowsOf(graft.plans.AsOfMergeJoin.asofMerge(clicks, purchases,
        on = Seq("user_id"), leftTs = "ts", rightTs = "p_ts",
        rightCols = Seq("p_value"), direction = dir))
      val wd = rowsOf(AsOfJoin.asof(clicks, purchases,
        on = Seq("user_id"), leftTs = "ts", rightTs = "p_ts",
        rightCols = Seq("p_value"), direction = dir))
      assert(auto.nonEmpty && auto == bc && auto == mg && auto == wd, dir)
      // the oversize route must agree too
      assert(rowsOf(autoAt(1L, dir)) == auto, dir)
    }
  }

  test("dispatch: small right side → broadcast probe (zero exchanges)") {
    val plan = autoAt(1L << 30).queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("asof_lookup"), plan)
  }

  test("dispatch: right side above threshold → merge exec") {
    val plan = autoAt(1L).queryExecution.executedPlan.toString()
    assert(plan.contains("AsOfMergeJoin"), plan)
  }

  test("dispatch: threshold <= 0 disables the broadcast rung") {
    val plan = autoAt(0L).queryExecution.executedPlan.toString()
    assert(plan.contains("AsOfMergeJoin"), plan)
  }

  test("dispatch: nearest → union+window form, parity with manual asof") {
    val auto = autoAt(1L << 30, "nearest")
    val plan = auto.queryExecution.executedPlan.toString()
    assert(plan.contains("Window"), plan)
    assert(rowsOf(auto) == rowsOf(AsOfJoin.asof(clicks, purchases,
      on = Seq("user_id"), leftTs = "ts", rightTs = "p_ts",
      rightCols = Seq("p_value"), direction = "nearest")))
  }

  test("dispatch: complex-typed carried column → merge exec even when small") {
    val arrRight = purchases.withColumn("p_hist", array(col("p_value")))
    spark.conf.set("graft.asof.broadcastThreshold", (1L << 30).toString)
    try {
      val auto = AsOfJoin.asofAuto(clicks, arrRight, on = Seq("user_id"),
        leftTs = "ts", rightTs = "p_ts", rightCols = Seq("p_value", "p_hist"))
      assert(auto.queryExecution.executedPlan.toString().contains("AsOfMergeJoin"))
      assert(auto.count() == clicks.count())
    } finally spark.conf.unset("graft.asof.broadcastThreshold")
  }

  test("tolerance parity across the auto routes (micros axis)") {
    val tol = Some(30L * 60 * 1000000) // 30 minutes
    val small = rowsOf(autoAt(1L << 30, tolMicros = tol))
    val large = rowsOf(autoAt(1L, tolMicros = tol))
    val manual = rowsOf(AsOfJoin.asofBroadcast(clicks, purchases,
      on = Seq("user_id"), leftTs = "ts", rightTs = "p_ts",
      rightCols = Seq("p_value"), toleranceMicros = tol))
    assert(small.nonEmpty && small == large && small == manual)
    // tolerance must actually bite: some matched rows null out vs no-tol
    val noTol = rowsOf(autoAt(1L << 30))
    assert(small != noTol)
  }

  test("micros tolerance on a date axis is rejected on every auto route") {
    val dLeft = clicks.withColumn("d", to_date(col("ts"))).drop("ts")
    val dRight = purchases.withColumn("p_d", to_date(col("p_ts"))).drop("p_ts")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofAuto(dLeft, dRight, on = Seq("user_id"),
        leftTs = "d", rightTs = "p_d", rightCols = Seq("p_value"),
        toleranceMicros = Some(1000000L))
    }
    assert(e.getMessage.contains("long-backed"))
  }
}
