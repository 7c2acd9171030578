package graft.pipeline

import graft.Tables
import org.apache.spark.sql.SparkSession

/** CLI twin of the reference Glue job (`glue_jobs/process_openaq_raw.py`),
  * keeping its parameter names (`--input_path`, `--output_path`, `--env`,
  * `--partition_cols`) so launch scripts port unchanged:
  *
  * {{{
  * sbt "runMain graft.pipeline.ProcessOpenaqRaw \
  *   --input_path /data/aq_raw --output_path /data/marts/vietnam \
  *   --env dev --partition_cols year,month,day"
  * }}}
  *
  * `--metrics observed` switches to [[OpenAqPipeline.runObserved]]
  * (counts + null audit collected during the write, no persist — the
  * scale path; validation is post-write, so combine with
  * `--write_mode overwrite-dynamic` for idempotent reruns).
  */
object ProcessOpenaqRaw {

  def parseArgs(args: Array[String]): Schemas.JobConfig = {
    val kv = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    require(kv.contains("input_path") && kv.contains("output_path"),
      "required: --input_path, --output_path")
    Schemas.JobConfig(
      inputPath = kv("input_path"),
      outputPath = kv("output_path"),
      env = kv.getOrElse("env", "dev"),
      partitionCols = kv.get("partition_cols")
        .map(_.split(",").toSeq).getOrElse(Seq("year", "month", "day")),
      writeMode = kv.getOrElse("write_mode", "append"))
  }

  def main(args: Array[String]): Unit = {
    val cfg = parseArgs(args)
    val b = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("process-openaq-raw")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val observed = args.sliding(2, 2)
      .exists(p => p.length == 2 && p(0) == "--metrics" && p(1) == "observed")
    Log.start(s"Glue-equivalent transform job (env=${cfg.env})")
    try {
      val (_, m) =
        if (observed) OpenAqPipeline.runObserved(spark, cfg)
        else OpenAqPipeline.run(spark, cfg)
      Log.ok(s"Read ${m.rawCount} raw records from ${cfg.inputPath}")
      Log.ok(s"Deduplicated to ${m.dedupCount} records")
      Log.ok(s"Enriched mart rows: ${m.enrichedCount}")
      Log.ok(s"Null audit clean: ${m.nullAudit}")
      Log.success(s"Wrote partitioned mart to ${cfg.outputPath}")
    } catch {
      case e: Throwable =>
        Log.fail(s"Job failed: ${e.getMessage}")
        throw e
    } finally spark.stop()
  }
}
