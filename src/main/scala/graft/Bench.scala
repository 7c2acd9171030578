package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with total + per-query wall times. Each query is
  * run twice; the second (warm: code generated, JIT'd, file listings
  * cached) timing is reported — the steady-state number a long-running
  * cluster job would see.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.benchQueries.map { name =>
      timeOnce(name) // warmup
      name -> timeOnce(name)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a failed query must not subtract from (i.e. improve) the headline
    // total: sum successes only and report failures explicitly
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedField =
      if (failed.isEmpty) "" else s""","failed":${failed.mkString("[", ",", "]")}"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$failedField,"sf":"$sfDir"}"""
    // belt: persist to a file for consumers that can't parse sbt stdout
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get("target/bench.json"), line + "\n")
    } catch { case e: Throwable => System.err.println(s"[bench] bench.json write failed: ${e.getMessage}") }
    spark.stop() // stop BEFORE printing so the JSON is the final stdout line
    println(line)
  }
}
