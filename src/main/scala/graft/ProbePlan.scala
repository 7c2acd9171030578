package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution

/** Disposable final-plan capture probe for AQE-spread triage:
  * `runMain graft.ProbePlan <query> [rounds]` executes the query and,
  * through a QueryExecutionListener, captures the FINAL adaptive plan
  * of every round (the plan the run actually executed — inspecting
  * `df.queryExecution` before/outside execution only shows the initial
  * AQE skeleton). Prints a per-round one-line digest (join strategies,
  * exchanges, AQE shuffle reads + their partition counts) and writes
  * each full plan to target/probe_plan_round<i>.txt for diffing, so a
  * run-to-run spread can be attributed to a plan flip vs pure runtime
  * noise (r14 verdict #2, q306's 1.5x).
  */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 6
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe-plan")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").foreach { kvs =>
      kvs.split(";").filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var lastPlan: String = ""
    // EVERY execution of the round, in order — the noop write is the
    // outermost, but checkpoint-heavy queries run their interesting joins
    // inside nested executions (eager localCheckpoints) whose lineage the
    // outer plan then truncates to an RDD scan. Dumping each phase's
    // final adaptive plan makes the executing join strategies committed
    // evidence instead of prose (r15 verdict #2/#6).
    val phasePlans = new java.util.concurrent.CopyOnWriteArrayList[String]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val p = qe.executedPlan.toString
        phasePlans.add(p)
        // keep the largest plan text for the one-line digest — the outer
        // query dominates
        if (p.length > lastPlan.length) lastPlan = p
      }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    })

    def digest(plan: String): String = {
      def n(token: String): Int = plan.sliding(token.length).count(_ == token)
      val coalesced = "coalesced from (\\d+) to (\\d+)".r
        .findAllMatchIn(plan).map(m => s"${m.group(1)}->${m.group(2)}").toSeq
      s"BHJ=${n("BroadcastHashJoin")} SMJ=${n("SortMergeJoin")} " +
        s"SHJ=${n("ShuffledHashJoin")} EX=${n("Exchange")} " +
        s"AQERead=${n("AQEShuffleRead")} coalesce=[${coalesced.mkString(",")}] " +
        s"skew=${n("isSkew")} topk=${n("TopKPerKey")}"
    }

    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val spilled = new java.util.concurrent.atomic.AtomicLong(0)
    val shuffleFetchWaitMs = new java.util.concurrent.atomic.AtomicLong(0)
    val taskRunMs = new java.util.concurrent.atomic.AtomicLong(0)
    val taskCpuMs = new java.util.concurrent.atomic.AtomicLong(0)
    val taskDeserMs = new java.util.concurrent.atomic.AtomicLong(0)
    val taskCount = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          shuffleFetchWaitMs.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
          taskRunMs.addAndGet(m.executorRunTime)
          taskCpuMs.addAndGet(m.executorCpuTime / 1000000)
          taskDeserMs.addAndGet(m.executorDeserializeTime)
          taskCount.incrementAndGet()
        }
      }
    })
    val forceGc = sys.env.get("SPARK_GRAFT_PROBE_GC").contains("1")
    for (i <- 1 to rounds) {
      lastPlan = ""
      phasePlans.clear()
      if (forceGc) { System.gc(); Thread.sleep(300) }
      val sp0 = spilled.get; val fw0 = shuffleFetchWaitMs.get
      val tr0 = taskRunMs.get; val tc0 = taskCpuMs.get
      val td0 = taskDeserMs.get; val tn0 = taskCount.get
      val jit0 = java.lang.management.ManagementFactory.getCompilationMXBean
        .getTotalCompilationTime
      val gc0 = gcMs
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val gcSec = (gcMs - gc0) / 1e3
      Thread.sleep(800) // listener bus is async
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(f"target/probe_plan_round$i%02d.txt"), lastPlan)
      // per-phase dumps of the LAST round (the settled one): one file per
      // nested execution, in execution order, each headed by its digest
      if (i == rounds) {
        import scala.jdk.CollectionConverters._
        phasePlans.asScala.zipWithIndex.foreach { case (p, k) =>
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(f"target/probe_plan_phase$k%02d.txt"),
            s"-- $name phase $k (round $i): ${digest(p)}\n$p")
        }
        println(s"[plan] $name: ${phasePlans.size} phase plans dumped " +
          "(target/probe_plan_phase*.txt)")
      }
      val spMb = (spilled.get - sp0) / 1e6
      val fwSec = (shuffleFetchWaitMs.get - fw0) / 1e3
      val trS = (taskRunMs.get - tr0) / 1e3
      val tcS = (taskCpuMs.get - tc0) / 1e3
      val tdS = (taskDeserMs.get - td0) / 1e3
      val tn = taskCount.get - tn0
      val jitS = (java.lang.management.ManagementFactory.getCompilationMXBean
        .getTotalCompilationTime - jit0) / 1e3
      println(f"[plan] $name round $i sec=$sec%.2f gc=$gcSec%.2f " +
        f"spill=$spMb%.0fMB fetchWait=$fwSec%.1f taskRun=$trS%.1f " +
        f"taskCpu=$tcS%.1f deser=$tdS%.1f nTasks=$tn jit=$jitS%.1f ${digest(lastPlan)}")
    }
    spark.stop()
  }
}
