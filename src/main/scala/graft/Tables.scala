package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * Tables are plain parquet files, one per table, under an sf-dir like
  * `/root/testdata/sf0.01`. At cluster scale these would be directories of
  * many files (possibly Hive-partitioned); `spark.read.parquet` handles both
  * shapes identically, so every query in the catalog takes the sf-dir as a
  * parameter and goes through here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session configs every graft session needs. `nanosAsLong` is required
    * because `events.parquet` carries TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright; with the flag it surfaces as a
    * long that [[load]] converts back to a (microsecond) timestamp.
    */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // nanos-as-long epoch column back to a real timestamp (µs precision —
    // the data's actual precision; integer division, no double rounding)
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  def lineitem(spark: SparkSession, d: String): DataFrame   = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame     = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame   = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame   = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame       = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame     = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame     = load(spark, d, "region")
  def events(spark: SparkSession, d: String): DataFrame     = load(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame  = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** Register all tables as temp views (the engine's "catalog crawler":
    * SURVEY §2.1 S12 — the reference runs a Glue Crawler; here registration
    * is a catalog call, partition discovery is automatic).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
