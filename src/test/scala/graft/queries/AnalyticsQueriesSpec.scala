package graft.queries

import graft.GraftSpark
import graft.pipeline.{OpenAqPipeline, Schemas}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The Athena SQL surface runs unchanged over a pipeline-produced mart
  * view (SURVEY §3.3).
  */
class AnalyticsQueriesSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private lazy val view: String = {
    val inDir = Files.createTempDirectory("graft-aq").toFile
    val rows = Seq(
      """{"location_id":18,"datetime":"2024-01-15T10:00:00+07:00","parameter":"pm25","value":45.5,"unit":"u","city":"Hanoi","country":"VN","latitude":21.0,"longitude":105.8}""",
      """{"location_id":18,"datetime":"2024-01-15T12:00:00+07:00","parameter":"pm25","value":55.5,"unit":"u","city":"Hanoi","country":"VN","latitude":21.0,"longitude":105.8}""",
      """{"location_id":2,"datetime":"2024-01-15T11:00:00+07:00","parameter":"pm10","value":80.0,"unit":"u","city":"Hue","country":"VN","latitude":16.4,"longitude":107.6}""")
    Files.write(new java.io.File(inDir, "raw.json").toPath,
      rows.mkString("\n").getBytes("UTF-8"))
    val outDir = Files.createTempDirectory("graft-aq-out").toFile.getAbsolutePath + "/mart"
    OpenAqPipeline.run(spark,
      Schemas.JobConfig(inputPath = inDir.getAbsolutePath, outputPath = outDir),
      viewName = "vietnam_aq")
    "vietnam_aq"
  }

  test("every Athena-surface query runs over the mart view") {
    AnalyticsQueries.queries(view).keys.foreach { name =>
      val df = AnalyticsQueries.run(spark, name, view)
      assert(df.columns.nonEmpty, name)
      df.collect() // must execute
    }
  }

  test("row_count and top_pm25 report the mart content") {
    assert(AnalyticsQueries.run(spark, "row_count", view).head().getLong(0) == 3L)
    val top = AnalyticsQueries.run(spark, "top_pm25_by_location_day", view).collect()
    assert(top.nonEmpty && top.head.getAs[Double]("avg_pm25") == 50.5)
  }

  test("validateTables counts registered tables (the crawler stage)") {
    val counts = AnalyticsQueries.validateTables(spark, Seq(view))
    assert(counts(view) == 3L)
  }

  test("SHOW PARTITIONS exposes the hive layout (Athena parity)") {
    // register the mart as a partitioned catalog table — the engine's
    // equivalent of crawler registration — and inspect partitions the way
    // the reference's runbooks do (`SHOW PARTITIONS`)
    spark.table(view).write.mode("overwrite")
      .partitionBy("year", "month", "day")
      .saveAsTable("vietnam_aq_tbl")
    try {
      val parts = spark.sql("SHOW PARTITIONS vietnam_aq_tbl")
        .collect().map(_.getString(0)).sorted
      assert(parts.contains("year=2024/month=01/day=15"), parts.mkString(", "))
      // string partition values: month='01' prunes, month=1 does not (the
      // documented contract asymmetry)
      assert(spark.table("vietnam_aq_tbl").filter("month = '01'").count() == 3L)
    } finally spark.sql("DROP TABLE IF EXISTS vietnam_aq_tbl")
  }
}
