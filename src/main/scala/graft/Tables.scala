package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

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

  /** Session configs every graft session needs. `nanosAsLong` stays for
    * back-compat with testdata generations that carried TIMESTAMP(NANOS)
    * (Spark's vectorized reader rejects nanos outright; with the flag it
    * surfaces as a long). Newer generations carry TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) → TIMESTAMP_NTZ; [[load]] normalizes both.
    */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC")

  /** Normalize an events-shaped `ts` column to session-TZ `TimestampType`
    * whatever the file encoding was:
    *   - TIMESTAMP(NANOS) via `nanosAsLong` → LongType nanos → integer-divide
    *     to µs (the data's actual precision; no double rounding);
    *   - TIMESTAMP(MICROS, NTZ) → TimestampNTZType → cast, value-preserving
    *     under the pinned UTC session time zone;
    *   - TIMESTAMP (adjusted-to-UTC) → already TimestampType, no-op.
    * Every consumer (batch via [[load]], streaming via the catalog's staged
    * reader) must funnel through here so a driver-side re-encode of the
    * testdata cannot silently shift the time axis again.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    if (!df.schema.fieldNames.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }

  /** Other driver tables carrying event-time columns that a nanos-long
    * re-encode (the round-7 breakage class) would zero: absorb ONLY the
    * long encoding for these — their current timestamp form (NTZ today)
    * is already what every query and oracle agrees on, so it passes
    * through untouched.
    */
  private val longTsColumns: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderdate"), "lineitem" -> Seq("l_shipdate"))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeTs(df)
    else longTsColumns.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.schema.fieldNames.contains(c) && d.schema(c).dataType == LongType)
        d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      else d
    }
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
