package graft.plans

import graft.GraftSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom whole-operator path (logical node -> strategy ->
  * partial/final physical heaps) proved against the stock window
  * formulation it replaces, plus the plan-shape contract.
  */
class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def events = graft.Tables.load(spark, sf, "events")
    .select(col("event_id"), col("event_type"), col("user_id"),
      (col("value") * 100 + signum(col("value")) * 0.5).cast("long").as("c"))

  test("operator output == window row_number form, cell-exact") {
    val viaOp = TopKPerKey.topKPerKey(events, Seq(col("event_type")),
      Seq((col("c"), false), (col("event_id"), true)), 3)
      .collect().map(_.toString).sorted
    val w = Window.partitionBy("event_type").orderBy(col("c").desc, col("event_id").asc)
    val viaWin = events.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= 3).drop("__rk")
      .collect().map(_.toString).sorted
    assert(viaOp.toSeq == viaWin.toSeq)
  }

  test("plan lowers to a partial/final pair around exactly one exchange") {
    val plan = TopKPerKey.topKPerKey(events, Seq(col("event_type")),
      Seq((col("c"), false), (col("event_id"), true)), 3)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyFinal"), plan)
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected exactly 1 exchange:\n$plan")
    assert(!plan.contains("Window"), plan) // the whole point
  }

  test("k >= group size passes every row through") {
    val small = events.limit(40).localCheckpoint(true)
    val out = TopKPerKey.topKPerKey(small, Seq(col("event_type")),
      Seq((col("c"), true), (col("event_id"), true)), 1000000)
    assert(out.count() == small.count())
  }

  test("the partial flush valve degrades to shuffle volume, never to wrong rows") {
    // force a pathologically tiny cap: every other input row flushes the
    // partial state — output must still be cell-exact
    spark.conf.set("spark.graft.topk.maxKeysInFlight", "2")
    try {
      val viaOp = TopKPerKey.topKPerKey(events, Seq(col("user_id")),
        Seq((col("c"), false), (col("event_id"), true)), 2)
        .collect().map(_.toString).sorted
      val w = Window.partitionBy("user_id").orderBy(col("c").desc, col("event_id").asc)
      val viaWin = events.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= 2).drop("__rk")
        .collect().map(_.toString).sorted
      assert(viaOp.toSeq == viaWin.toSeq)
    } finally spark.conf.unset("spark.graft.topk.maxKeysInFlight")
  }

  test("the BYTE valve flushes under a tiny byte cap, rows still cell-exact") {
    // second valve axis (r11 ADVICE): cap retained bytes, not keys — a
    // few hundred bytes forces a flush every handful of rows
    spark.conf.set("spark.graft.topk.maxBytesInFlight", "512")
    try {
      val viaOp = TopKPerKey.topKPerKey(events, Seq(col("user_id")),
        Seq((col("c"), false), (col("event_id"), true)), 2)
        .collect().map(_.toString).sorted
      val w = Window.partitionBy("user_id").orderBy(col("c").desc, col("event_id").asc)
      val viaWin = events.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= 2).drop("__rk")
        .collect().map(_.toString).sorted
      assert(viaOp.toSeq == viaWin.toSeq)
    } finally spark.conf.unset("spark.graft.topk.maxBytesInFlight")
  }

  test("the final phase is a sorted streaming take — Sort below Final, not a hash map") {
    val plan = TopKPerKey.topKPerKey(events, Seq(col("event_type")),
      Seq((col("c"), false), (col("event_id"), true)), 3)
      .queryExecution.executedPlan.toString()
    // EnsureRequirements satisfies the final's requiredChildOrdering with
    // a sort of the already k-pruned stream
    assert(plan.contains("Sort"), plan)
    assert(plan.indexOf("TopKPerKeyFinal") < plan.indexOf("Sort"), plan)
    assert(plan.indexOf("Sort") < plan.indexOf("TopKPerKeyPartial"), plan)
  }

  // coarse bucket => plenty of exact ties, the rank modes' whole point
  private def bucketed = events.withColumn("b", expr("c div 50").cast("long"))

  test("RankMode == window rank() form, boundary ties all emitted") {
    val viaOp = TopKPerKey.topKPerKey(bucketed, Seq(col("event_type")),
      Seq((col("b"), false)), 3, RankMode)
      .collect().map(_.toString).sorted
    val w = Window.partitionBy("event_type").orderBy(col("b").desc)
    val viaWin = bucketed.withColumn("__rk", rank().over(w))
      .filter(col("__rk") <= 3).drop("__rk")
      .collect().map(_.toString).sorted
    assert(viaOp.nonEmpty && viaOp.toSeq == viaWin.toSeq)
  }

  test("DenseRankMode == window dense_rank() form") {
    val viaOp = TopKPerKey.topKPerKey(bucketed, Seq(col("event_type")),
      Seq((col("b"), true)), 2, DenseRankMode)
      .collect().map(_.toString).sorted
    val w = Window.partitionBy("event_type").orderBy(col("b").asc)
    val viaWin = bucketed.withColumn("__rk", dense_rank().over(w))
      .filter(col("__rk") <= 2).drop("__rk")
      .collect().map(_.toString).sorted
    assert(viaOp.nonEmpty && viaOp.toSeq == viaWin.toSeq)
  }

  test("rank modes stay cell-exact under a forced flush valve") {
    spark.conf.set("spark.graft.topk.maxKeysInFlight", "2")
    try {
      for (
        (m, wf) <- Seq[(TopKMode, org.apache.spark.sql.Column)](
          (RankMode, rank().over(Window.partitionBy("user_id").orderBy(col("b").desc))),
          (DenseRankMode, dense_rank().over(Window.partitionBy("user_id").orderBy(col("b").desc))))
      ) {
        val viaOp = TopKPerKey.topKPerKey(bucketed, Seq(col("user_id")),
          Seq((col("b"), false)), 2, m)
          .collect().map(_.toString).sorted
        val viaWin = bucketed.withColumn("__rk", wf)
          .filter(col("__rk") <= 2).drop("__rk")
          .collect().map(_.toString).sorted
        assert(viaOp.toSeq == viaWin.toSeq, s"mode $m")
      }
    } finally spark.conf.unset("spark.graft.topk.maxKeysInFlight")
  }

  test("multi-column keys and ascending order work") {
    val keyed = events.withColumn("b", col("event_id") % 7)
    val viaOp = TopKPerKey.topKPerKey(keyed, Seq(col("event_type"), col("b")),
      Seq((col("c"), true), (col("event_id"), true)), 2)
      .collect().map(_.toString).sorted
    val w = Window.partitionBy("event_type", "b")
      .orderBy(col("c").asc, col("event_id").asc)
    val viaWin = keyed.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= 2).drop("__rk")
      .collect().map(_.toString).sorted
    assert(viaOp.toSeq == viaWin.toSeq)
  }
}
