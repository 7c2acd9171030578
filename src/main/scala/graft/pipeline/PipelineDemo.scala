package graft.pipeline

import graft.Tables
import graft.queries.AnalyticsQueries
import org.apache.spark.sql.SparkSession

/** Executable end-to-end demo of the mart pipeline: lands fixture NDJSON
  * in a temp raw zone, runs scan → transforms → partitioned parquet →
  * view registration, then the Athena-surface analytics over the view.
  * `sbt "runMain graft.pipeline.PipelineDemo"`.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder()
      .master("local[4]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val inDir = java.nio.file.Files.createTempDirectory("graft-demo-raw").toFile
    val rows = Seq(
      """{"location_id":18,"location_name":"Hanoi Station","datetime":"2024-01-15T10:00:00+07:00","parameter":"pm25","value":45.5,"unit":"u","city":"Hanoi","country":"VN","latitude":21.0,"longitude":105.8}""",
      """{"location_id":18,"location_name":"Hanoi Station","datetime":"2024-01-15T10:00:00+07:00","parameter":"pm25","value":45.5,"unit":"u","city":"Hanoi","country":"VN","latitude":21.0,"longitude":105.8}""",
      """{"location_id":18,"location_name":"Hanoi Station","datetime":"2024-01-15T12:00:00+07:00","parameter":"pm25","value":55.5,"unit":"u","city":"Hanoi","country":"VN","latitude":21.0,"longitude":105.8}""",
      """{"location_id":2,"location_name":null,"datetime":"2024-01-15T11:00:00+07:00","parameter":"pm10","value":80.0,"unit":"u","city":null,"country":null,"latitude":null,"longitude":null}""",
      """{"location_id":3,"location_name":"X","datetime":"bad","parameter":"pm25","value":1.0,"unit":"u","city":"X","country":"VN","latitude":0.0,"longitude":0.0}""")
    java.nio.file.Files.write(new java.io.File(inDir, "raw_1.json").toPath,
      rows.mkString("\n").getBytes("UTF-8"))

    val outDir = java.nio.file.Files.createTempDirectory("graft-demo-mart")
      .toFile.getAbsolutePath + "/mart"
    val (_, metrics) = OpenAqPipeline.run(spark,
      Schemas.JobConfig(inputPath = inDir.getAbsolutePath, outputPath = outDir))

    println(s"[demo] raw=${metrics.rawCount} dedup=${metrics.dedupCount} " +
      s"mart=${metrics.enrichedCount} nullAudit=${metrics.nullAudit}")

    AnalyticsQueries.queries("vietnam").foreach { case (name, _) =>
      val n = AnalyticsQueries.run(spark, name).count()
      println(s"[demo] athena-surface $name -> $n rows")
    }
    println(s"[demo] validate: ${AnalyticsQueries.validateTables(spark, Seq("vietnam"))}")

    // hour-keyed raw-zone sink + bucketed mart table
    val rawOut = java.nio.file.Files.createTempDirectory("graft-demo-hourly")
      .toFile.getAbsolutePath + "/raw"
    Sink.writeHourlyNdjson(
      spark.table("vietnam").select("location_id", "datetime", "pm25", "pm10"),
      "datetime", rawOut)
    println(s"[demo] hourly ndjson partitions = " +
      spark.read.json(rawOut).select("y", "m", "d", "h").distinct().count())

    Sink.writeBucketed(spark.table("vietnam"), "vietnam_bucketed", "location_id", 8)
    val bucketedAgg = spark.table("vietnam_bucketed")
      .groupBy("location_id").count()
    val shuffles = bucketedAgg.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    println(s"[demo] bucketed agg rows=${bucketedAgg.count()} exchanges=$shuffles (expect 0)")
    spark.stop()
  }
}
