package graft.pipeline

import graft.GraftSpark
import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline acceptance mirroring the reference's full-flow test
  * (reference `tests/test_glue_complete.py:267-319,326-406`): NDJSON in,
  * 15-column mart out, partitioned parquet on disk, analytics over the
  * registered view.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private val ndjson = Seq(
    // loc 18: duplicate (location,datetime) pair + second parameter
    """{"location_id":18,"datetime":"2024-01-15T10:00:00+07:00","parameter":"pm25","value":45.5,"unit":"µg/m³","city":"Hanoi","country":"VN","latitude":21.0285,"longitude":105.8542}""",
    """{"location_id":18,"datetime":"2024-01-15T10:00:00+07:00","parameter":"pm25","value":47.5,"unit":"µg/m³","city":"Hanoi","country":"VN","latitude":21.0285,"longitude":105.8542}""",
    """{"location_id":18,"datetime":"2024-01-15T10:00:00+07:00","parameter":"pm10","value":80.0,"unit":"µg/m³","city":"Hanoi","country":"VN","latitude":21.0285,"longitude":105.8542}""",
    // loc 2: null city/coords → defaults; different hour
    """{"location_id":2,"datetime":"2024-01-15T11:00:00+07:00","parameter":"pm25","value":12.0,"unit":"µg/m³","city":null,"country":null,"latitude":null,"longitude":null}""",
    // invalid datetime → dropped
    """{"location_id":3,"datetime":"not-a-date","parameter":"pm25","value":1.0,"unit":"µg/m³","city":"X","country":"VN","latitude":0.0,"longitude":0.0}""")

  test("full pipeline: NDJSON -> 15-col mart -> partitioned parquet -> SQL") {
    val inDir = Files.createTempDirectory("graft-in").toFile
    val outDir = Files.createTempDirectory("graft-out").toFile.getAbsolutePath + "/mart"
    Files.write(new java.io.File(inDir, "raw_1.json").toPath,
      ndjson.mkString("\n").getBytes("UTF-8"))

    val cfg = Schemas.JobConfig(inputPath = inDir.getAbsolutePath, outputPath = outDir)
    val (mart, metrics) = OpenAqPipeline.run(spark, cfg, viewName = "vietnam_test")

    assert(metrics.rawCount == 5)
    assert(metrics.dedupCount == 2)     // invalid dropped; (18,10:00) deduped; loc 2
    assert(metrics.enrichedCount == 2)
    assert(metrics.nullAudit.values.forall(_ == 0L))

    // 15-column contract (FIXTURES F6)
    val sch = mart.schema
    assert(Schemas.martColumns.toSet.subsetOf(mart.columns.toSet))
    assert(sch("location_id").dataType == StringType)
    assert(sch("datetime").dataType == TimestampType)
    assert(sch("year").dataType == IntegerType)
    assert(sch("month").dataType == StringType)
    assert(sch("pm25").dataType == DoubleType)

    // loc 2 defaults: city Unknown, lat/lon 0.0 (reference `:311-317`)
    val loc2 = mart.filter(mart("location_id") === "2").head()
    assert(loc2.getAs[String]("city_name") == "Unknown")
    assert(loc2.getAs[String]("country_code") == "VN")
    assert(loc2.getAs[Double]("latitude") == 0.0)

    // Hive layout on disk: UTC partition (10:00+07:00 → 03:00 UTC Jan 15)
    assert(new java.io.File(s"$outDir/year=2024/month=01/day=15").exists())

    // Athena-surface analytics over the registered view (README.md:393-396)
    val top = spark.sql(
      """SELECT location_id, city_name, COUNT(*) AS c
         FROM vietnam_test GROUP BY location_id, city_name ORDER BY c DESC""")
    assert(top.count() == 2)
  }

  test("runObserved: identical metrics and mart via Observation, no extra pass") {
    val inDir = Files.createTempDirectory("graft-in-obs").toFile
    Files.write(new java.io.File(inDir, "raw_1.json").toPath,
      ndjson.mkString("\n").getBytes("UTF-8"))
    val outA = Files.createTempDirectory("graft-out-obs-a").toFile.getAbsolutePath + "/mart"
    val outB = Files.createTempDirectory("graft-out-obs-b").toFile.getAbsolutePath + "/mart"

    val (_, mRun) = OpenAqPipeline.run(spark,
      Schemas.JobConfig(inputPath = inDir.getAbsolutePath, outputPath = outA),
      viewName = "obs_run")
    val (_, mObs) = OpenAqPipeline.runObserved(spark,
      Schemas.JobConfig(inputPath = inDir.getAbsolutePath, outputPath = outB),
      viewName = "obs_observed")

    assert(mObs == mRun) // every count + the full null-audit map
    // written marts are row-identical (compare on the deterministic key)
    val a = spark.read.parquet(outA).selectExpr("location_id", "datetime", "pm25")
      .collect().map(_.toString).sorted.toSeq
    val b = spark.read.parquet(outB).selectExpr("location_id", "datetime", "pm25")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("quarantined read splits malformed lines from valid rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-quarantine").toFile
    java.nio.file.Files.write(new java.io.File(dir, "raw.json").toPath,
      Seq(
        """{"location_id":18,"datetime":"2024-01-15T10:00:00Z","parameter":"pm25","value":45.5}""",
        """{this is not json at all""",
        """{"location_id":19,"datetime":"2024-01-15T11:00:00Z","parameter":"pm10","value":12.0}""")
        .mkString("\n").getBytes("UTF-8"))
    val (good, quarantined) = OpenAqPipeline.readRawQuarantined(
      spark, Schemas.JobConfig(inputPath = dir.getAbsolutePath, outputPath = "/unused"))
    assert(good.count() == 2)
    assert(good.columns.toSet == Schemas.rawMeasurement.fieldNames.toSet)
    val bad = quarantined.collect().map(_.getString(0))
    assert(bad.length == 1 && bad.head.startsWith("{this is not json"))
  }

  test("rerun in append mode duplicates data by design (reference parity)") {
    val inDir = Files.createTempDirectory("graft-in2").toFile
    val outDir = Files.createTempDirectory("graft-out2").toFile.getAbsolutePath + "/mart"
    Files.write(new java.io.File(inDir, "raw_1.json").toPath,
      ndjson.mkString("\n").getBytes("UTF-8"))
    val cfg = Schemas.JobConfig(inputPath = inDir.getAbsolutePath, outputPath = outDir)
    OpenAqPipeline.run(spark, cfg, viewName = "v1")
    OpenAqPipeline.run(spark, cfg, viewName = "v2")
    assert(spark.read.parquet(outDir).count() == 4) // 2 rows × 2 runs
  }

  test("schema inference mode survives all-null columns (VoidType regression)") {
    // reference tests/test_glue_complete.py:222-265 — all-null JSON columns
    // infer as void; the explicit casts in buildMetadata must still work
    val inDir = Files.createTempDirectory("graft-in3").toFile
    val rows = Seq(
      """{"location_id":7,"datetime":"2024-01-15T10:00:00Z","parameter":"pm25","value":5.0,"unit":"u","city":null,"country":null,"latitude":null,"longitude":null}""")
    Files.write(new java.io.File(inDir, "raw.json").toPath,
      rows.mkString("\n").getBytes("UTF-8"))
    val outDir = Files.createTempDirectory("graft-out3").toFile.getAbsolutePath + "/mart"
    val cfg = Schemas.JobConfig(inputPath = inDir.getAbsolutePath,
      outputPath = outDir, inferSchema = true)
    val (mart, metrics) = OpenAqPipeline.run(spark, cfg, viewName = "v3")
    assert(metrics.enrichedCount == 1)
    assert(mart.head().getAs[String]("city_name") == "Unknown")
    // the declared-schema default path is immune by construction: same
    // all-null input, same mart — and the all-null columns carry their
    // declared types, not whatever inference produced
    val declared = Schemas.JobConfig(inputPath = inDir.getAbsolutePath,
      outputPath = Files.createTempDirectory("graft-out3b").toFile.getAbsolutePath + "/mart")
    val (mart2, metrics2) = OpenAqPipeline.run(spark, cfg = declared, viewName = "v3b")
    assert(metrics2.enrichedCount == 1)
    assert(mart2.head().getAs[String]("city_name") == "Unknown")
    assert(mart2.schema("latitude").dataType == DoubleType)
  }
}
