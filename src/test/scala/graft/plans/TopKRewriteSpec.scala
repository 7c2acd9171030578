package graft.plans

import graft.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer-rule rung end to end: a session built with
  * [[GraftExtensions]] silently rewrites the row_number()<=k window
  * idiom into the bounded-heap operator pair — same rows, no Window in
  * the executed plan — while out-of-contract shapes are left alone.
  */
class TopKRewriteSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate RETURNS any existing session and silently DROPS the
    // builder's extensions (measured: standalone this spec passed, in
    // the full suite it got GraftSpark's extension-free session and the
    // rewrite never fired). Clear active/default so the builder builds a
    // NEW session (sharing the JVM's SparkContext) with the extensions
    // applied, then restore the shared session as default for the
    // suites that follow.
    val base = graft.GraftSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder()
      .master("local[4]")
      .appName("graft-topk-rewrite")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      // the rule is opt-in (default off — tie caveat, r11 ADVICE)
      .config(TopKRewriteRule.EnabledKey, "true")
      .withExtensions(new GraftExtensions)
    graft.Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    assert(s ne base, "extension session was not freshly built")
    s
  }

  private def events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    .select(col("event_id"), col("event_type"),
      (col("value") * 100 + signum(col("value")) * 0.5).cast("long").as("c"))

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("event_type").orderBy(col("c").desc, col("event_id").asc)
    events.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  test("the window idiom is rewritten to the heap pair and rows are identical") {
    val df = windowTopK(3)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyFinal"), plan)
    assert(!plan.contains("Window"), plan)
    // rows equal the un-extended session's window result
    val expected = TopKPerKey.topKPerKey(events, Seq(col("event_type")),
      Seq((col("c"), false), (col("event_id"), true)), 3)
      .collect().map(_.toString).sorted
    assert(df.collect().map(_.toString).sorted.toSeq == expected.toSeq)
  }

  test("out-of-contract shapes are NOT rewritten") {
    // rank column kept in the output -> schema needs the Window
    val w = Window.partitionBy("event_type").orderBy(col("c").desc, col("event_id").asc)
    val kept = events.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
    assert(kept.queryExecution.executedPlan.toString().contains("Window"))
    assert(kept.columns.contains("rk"))
    // percent_rank() (not rank-like-limitable) is left alone
    val pct = events.withColumn("__rk", percent_rank().over(w))
      .filter(col("__rk") <= 0.5).drop("__rk")
    assert(pct.queryExecution.executedPlan.toString().contains("Window"))
  }

  test("rank() and dense_rank() idioms rewrite with tie semantics intact") {
    // coarse bucket => exact ties at the boundary, the semantics under test
    val bucketed = events.withColumn("b", expr("c div 50").cast("long"))
    val w = Window.partitionBy("event_type").orderBy(col("b").desc)
    for ((fn, mode) <- Seq(rank() -> RankMode, dense_rank() -> DenseRankMode)) {
      val df = bucketed.withColumn("__rk", fn.over(w))
        .filter(col("__rk") <= 3).drop("__rk")
      val plan = df.queryExecution.executedPlan.toString()
      assert(plan.contains("TopKPerKeyPartial"), s"$mode:\n$plan")
      assert(!plan.contains("Window"), s"$mode:\n$plan")
      // rows equal the un-extended base session's window result
      val expected = {
        val base = graft.GraftSpark.spark
        val ev = graft.Tables.load(base, "/root/testdata/sf0.001", "events")
          .select(col("event_id"), col("event_type"),
            (col("value") * 100 + signum(col("value")) * 0.5).cast("long").as("c"))
          .withColumn("b", expr("c div 50").cast("long"))
        ev.withColumn("__rk",
            fn.over(Window.partitionBy("event_type").orderBy(col("b").desc)))
          .filter(col("__rk") <= 3).drop("__rk")
          .collect().map(_.toString).sorted
      }
      assert(df.collect().map(_.toString).sorted.toSeq == expected.toSeq, s"$mode")
    }
  }

  test("the rule is a no-op unless spark.graft.topk.rewrite.enabled") {
    spark.conf.set(TopKRewriteRule.EnabledKey, "false")
    try {
      val plan = windowTopK(3).queryExecution.executedPlan.toString()
      assert(plan.contains("Window"), plan)
      assert(!plan.contains("TopKPerKeyPartial"), plan)
    } finally spark.conf.set(TopKRewriteRule.EnabledKey, "true")
  }

  test("strict less-than derives k-1") {
    val df = {
      val w = Window.partitionBy("event_type").orderBy(col("c").desc, col("event_id").asc)
      events.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") < 4).drop("__rk")
    }
    assert(!df.queryExecution.executedPlan.toString().contains("Window"))
    val perType = df.groupBy("event_type").count().collect()
    assert(perType.forall(_.getLong(1) == 3L), perType.mkString(", "))
  }
}
