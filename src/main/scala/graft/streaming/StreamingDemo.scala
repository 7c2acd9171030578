package graft.streaming

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Executable streaming smoke: lands two NDJSON micro-batches in a temp
  * raw zone, runs the continuous dedup stream over them, and prints row
  * counts after each batch. `sbt "runMain graft.streaming.StreamingDemo"`.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("graft-stream-demo").toFile
    def land(name: String, rows: String): Unit =
      java.nio.file.Files.write(new java.io.File(dir, name).toPath, rows.getBytes("UTF-8"))

    land("b1.json",
      """{"location_id":18,"datetime":"2024-01-15T10:00:00Z","parameter":"pm25","value":45.5}
        |{"location_id":18,"datetime":"2024-01-15T10:00:00Z","parameter":"pm25","value":45.5}
        |{"location_id":18,"datetime":"2024-01-15T14:00:00Z","parameter":"pm25","value":10.0}""".stripMargin)

    val deduped = StreamingIngest.dedupedStream(
      StreamingIngest.readRawStream(spark, dir.getAbsolutePath))
    val q = StreamingIngest.runToMemory(deduped, "demo_out")
    println(s"[demo] batch1 deduped rows = ${spark.table("demo_out").count()} (expect 2)")

    land("b2.json",
      """{"location_id":18,"datetime":"2024-01-15T10:00:00Z","parameter":"pm25","value":45.5}
        |{"location_id":18,"datetime":"2024-01-15T15:00:00Z","parameter":"pm25","value":20.0}""".stripMargin)
    q.processAllAvailable()
    println(s"[demo] after cross-batch replay = ${spark.table("demo_out").count()} (expect 3)")

    q.stop()
    spark.stop()
  }
}
