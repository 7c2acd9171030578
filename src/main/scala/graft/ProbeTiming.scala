package graft

import org.apache.spark.sql.SparkSession

/** Disposable build/plan/execute phase-split probe for bench triage:
  * `runMain graft.ProbeTiming <query> [rounds]` times DataFrame
  * construction, physical planning, and execution separately, so a
  * "query got slower" flag can be attributed to planner overhead
  * (session-wide rule/function growth) vs actual execution.
  */
object ProbeTiming {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to rounds) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"[probe] $name round $i: build=${(t1 - t0) / 1e9}%.3f " +
        f"plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f")
    }
    spark.stop()
  }
}
