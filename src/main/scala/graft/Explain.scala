package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for catalog queries.
  * `sbt "runMain graft.Explain q31_region_revenue q13_range_filter"` (no
  * args = the bench subset). Used to check that filters reach the parquet
  * scan (PushedFilters), projections prune (ReadSchema), small dimensions
  * broadcast, and codegen spans stay wide — the properties that decide
  * whether a plan survives a 100x scale-up.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val b = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.benchQueries
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
