package graft.streaming

import graft.GraftSpark
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def writeBatch(dir: java.io.File, name: String, rows: Seq[String]): Unit =
    Files.write(new java.io.File(dir, name).toPath, rows.mkString("\n").getBytes("UTF-8"))

  test("streaming dedup drops cross-batch duplicates within the watermark") {
    val inDir = Files.createTempDirectory("graft-stream").toFile
    writeBatch(inDir, "b1.json", Seq(
      """{"location_id":18,"datetime":"2024-01-15T10:00:00Z","parameter":"pm25","value":45.5}""",
      """{"location_id":18,"datetime":"2024-01-15T10:00:00Z","parameter":"pm25","value":45.5}""",
      """{"location_id":18,"datetime":"2024-01-15T10:05:00Z","parameter":"pm25","value":47.0}"""))

    val deduped = StreamingIngest.dedupedStream(
      StreamingIngest.readRawStream(spark, inDir.getAbsolutePath))
    val q = StreamingIngest.runToMemory(deduped, "dedup_out")
    try {
      // within-batch dup collapsed
      assert(spark.table("dedup_out").count() == 2)
      // second batch replays one key and adds a new one: only the new survives
      writeBatch(inDir, "b2.json", Seq(
        """{"location_id":18,"datetime":"2024-01-15T10:00:00Z","parameter":"pm25","value":45.5}""",
        """{"location_id":18,"datetime":"2024-01-15T10:10:00Z","parameter":"pm25","value":50.0}"""))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 3)
    } finally q.stop()
  }

  test("batched inference runs unchanged under Structured Streaming (stream/batch parity)") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-stream-inf").toFile
    val docs = Seq(
      """{"doc_id":1,"text":"alpha beta gamma"}""",
      """{"doc_id":2,"text":"one two three four five"}""",
      """{"doc_id":3,"text":"  "}""")
    writeBatch(inDir, "d1.json", docs)
    val schema = "doc_id LONG, text STRING"
    val stream = spark.readStream.schema(schema).json(inDir.getAbsolutePath)
      .as[(Long, String)]
    val scorer = new graft.ops.Inference.TokenDensityScorer
    val q = StreamingIngest.runToMemory(
      graft.ops.Inference.scoreBatched(stream, scorer, batchSize = 2),
      "inf_out")
    try {
      val streamed = spark.table("inf_out").orderBy("doc_id")
        .as[(Long, Double)].collect().toSeq
      val batch = graft.ops.Inference.scoreBatched(
          spark.read.schema(schema).json(inDir.getAbsolutePath).as[(Long, String)],
          scorer, batchSize = 2)
        .orderBy("doc_id").as[(Long, Double)].collect().toSeq
      assert(streamed == batch && streamed.length == 3)
    } finally q.stop()
  }

  test("corpus mixing runs unchanged under Structured Streaming (stream/batch parity)") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("graft-stream-mix").toFile
    val docs = (1 to 40).map(i => s"""{"doc_id":$i,"src":"src${i % 3}"}""")
    writeBatch(inDir, "d1.json", docs)
    val schema = "doc_id LONG, src STRING"
    import org.apache.spark.sql.functions.col
    val weights = Map("src0" -> 2.0, "src1" -> 0.5)
    def mix(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Sampling.corpusMix(df, col("src"), col("doc_id"), weights)
    // explode + deterministic filter are stateless — legal in append mode
    // with no watermark, and must emit exactly the batch rows
    val q = StreamingIngest.runToMemory(
      mix(spark.readStream.schema(schema).json(inDir.getAbsolutePath)),
      "mix_out")
    try {
      val streamed = spark.table("mix_out")
        .select("doc_id", "epoch").as[(Long, Long)].collect().sorted.toSeq
      val batch = mix(spark.read.schema(schema).json(inDir.getAbsolutePath))
        .select("doc_id", "epoch").as[(Long, Long)].collect().sorted.toSeq
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("hourly windowed aggregation emits per-hour means after watermark close") {
    val inDir = Files.createTempDirectory("graft-stream2").toFile
    writeBatch(inDir, "b1.json", Seq(
      """{"location_id":18,"datetime":"2024-01-15T10:00:00Z","parameter":"pm25","value":40.0}""",
      """{"location_id":18,"datetime":"2024-01-15T10:30:00Z","parameter":"pm25","value":50.0}""",
      """{"location_id":18,"datetime":"2024-01-15T14:00:00Z","parameter":"pm25","value":10.0}"""))

    val agg = StreamingIngest.hourlyAggregates(
      StreamingIngest.readRawStream(spark, inDir.getAbsolutePath)
        .transform(graft.pipeline.Transforms.parseDatetime)
        .transform(graft.pipeline.Transforms.dropInvalidDatetime),
      watermark = "1 hour")
    // complete mode not allowed with append watermark semantics in memory
    // smoke; advance the watermark with a late-hour batch then read what
    // closed. The 10:00 window closes once 14:00 data arrives (wm 1h).
    val q = StreamingIngest.runToMemory(agg, "hourly_out")
    try {
      val rows = spark.table("hourly_out").collect()
      assert(rows.exists(r =>
        r.getAs[java.sql.Timestamp]("datetime").toString.startsWith("2024-01-15 10:00") &&
        r.getAs[Double]("value") == 45.0 && r.getAs[Long]("n") == 2L))
    } finally q.stop()
  }

  test("exactly-once batch writer makes replays idempotent; append duplicates") {
    import org.apache.spark.sql.functions._
    val batch = spark.range(4)
      .withColumn("datetime", lit("2024-01-15T10:00:00Z").cast("timestamp"))
      .withColumn("value", col("id").cast("double"))

    val exactDir = Files.createTempDirectory("graft-eo").toFile.getAbsolutePath + "/mart"
    val eo = StreamingIngest.martBatchWriter(exactDir, exactlyOnce = true)
    eo(batch, 7L); eo(batch, 7L) // replay of the same batch id
    assert(spark.read.parquet(exactDir).count() == 4)

    val appendDir = Files.createTempDirectory("graft-alo").toFile.getAbsolutePath + "/mart"
    val alo = StreamingIngest.martBatchWriter(appendDir, exactlyOnce = false)
    alo(batch, 7L); alo(batch, 7L)
    assert(spark.read.parquet(appendDir).count() == 8) // at-least-once by design
  }

  test("restart from checkpoint: dedup state survives and no batch is reprocessed") {
    // the property none of the single-query tests cover: a SECOND
    // StreamingQuery started on the SAME checkpoint must (a) restore the
    // dropDuplicates state store — a key seen before the stop is still a
    // duplicate after it — and (b) not re-emit phase-1 batches (the
    // file-source offsets committed in the checkpoint are honored).
    val inDir = Files.createTempDirectory("graft-restart-in").toFile
    val outDir = Files.createTempDirectory("graft-restart-out").toFile.getAbsolutePath + "/mart"
    val ckpt = Files.createTempDirectory("graft-restart-ck").toFile.getAbsolutePath

    def startQuery() = StreamingIngest.writeMart(
      StreamingIngest.dedupedStream(
        StreamingIngest.readRawStream(spark, inDir.getAbsolutePath)),
      outDir, ckpt, exactlyOnce = true).start()

    writeBatch(inDir, "b1.json", Seq(
      """{"location_id":18,"datetime":"2024-01-15T10:00:00Z","parameter":"pm25","value":45.5}""",
      """{"location_id":18,"datetime":"2024-01-15T10:05:00Z","parameter":"pm25","value":47.0}"""))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(outDir).count() == 2)

    // phase 2 after the stop: one replay of a phase-1 key, one new key
    writeBatch(inDir, "b2.json", Seq(
      """{"location_id":18,"datetime":"2024-01-15T10:00:00Z","parameter":"pm25","value":45.5}""",
      """{"location_id":18,"datetime":"2024-01-15T10:10:00Z","parameter":"pm25","value":50.0}"""))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(outDir)
    // 3 rows total: phase-1 rows exactly once (not reprocessed), the
    // replayed key dropped by the RESTORED state, the new key appended
    assert(out.count() == 3, out.collect().mkString(", "))
    assert(out.select("location_id", "datetime", "parameter").distinct().count() == 3)
  }

  test("stream-stream interval join matches only rows within the time bound") {
    val measDir = Files.createTempDirectory("graft-ssj-l").toFile
    val statusDir = Files.createTempDirectory("graft-ssj-r").toFile
    writeBatch(measDir, "b1.json", Seq(
      """{"location_id":18,"datetime":"2024-01-15T10:00:00Z","parameter":"pm25","value":45.5}""",
      """{"location_id":18,"datetime":"2024-01-15T16:00:00Z","parameter":"pm25","value":50.0}""",
      """{"location_id":19,"datetime":"2024-01-15T10:00:00Z","parameter":"pm25","value":12.0}"""))
    // status stream reuses the raw schema; "parameter" carries the status
    writeBatch(statusDir, "b1.json", Seq(
      """{"location_id":18,"datetime":"2024-01-15T10:30:00Z","parameter":"calibrated","value":1.0}""",
      """{"location_id":19,"datetime":"2024-01-15T13:00:00Z","parameter":"calibrated","value":1.0}"""))

    def parsed(dir: java.io.File) =
      StreamingIngest.readRawStream(spark, dir.getAbsolutePath)
        .transform(graft.pipeline.Transforms.parseDatetime)
        .transform(graft.pipeline.Transforms.dropInvalidDatetime)

    val joined = StreamingIngest.streamStreamJoin(
      parsed(measDir), parsed(statusDir),
      key = "location_id", leftTs = "datetime", rightTs = "datetime",
      within = "1 hour")
    val q = StreamingIngest.runToMemory(joined, "ssj_out")
    try {
      val rows = spark.table("ssj_out")
        .select("location_id", "value", "r_parameter").collect()
      // loc 18 @10:00 is within 1h of its 10:30 status; the 16:00 row and
      // loc 19 (status 3h away) are not
      assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSet == Set((18L, 45.5)))
      assert(rows.forall(_.getString(2) == "calibrated"))
    } finally q.stop()
  }

  test("transformWithState carries ValueState across micro-batches") {
    // two parquet files fed one-per-trigger; user 7 appears in both, so
    // the update stream must emit (7, 1, 100) for batch 1 and then
    // (7, 2, 300) for batch 2 — the second row PROVES the processor read
    // batch-1 state back from the store (a stateless rerun would emit
    // (7, 1, 200)).
    val sess = spark.newSession()
    sess.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-tws-spec")
    Seq(UserSpend(7L, 100L), UserSpend(8L, 50L)).toDF()
      .coalesce(1).write.parquet(s"$dir/f1")
    Seq(UserSpend(7L, 200L)).toDF()
      .coalesce(1).write.parquet(s"$dir/f2")
    val footer = sess.read.parquet(s"$dir/*").schema
    val stream = sess.readStream.schema(footer)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/*").as[UserSpend]
    val out = stream.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
    val q = out.toDF().writeStream.format("memory").queryName("tws_spec")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val rows = sess.table("tws_spec").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val user7 = rows.filter(_._1 == 7L)
      assert(user7.contains((7L, 2L, 300L)),
        s"state did not survive the batch boundary: $rows")
      assert(rows.contains((8L, 1L, 50L)), rows.toString)
      // both per-batch emissions present (update mode appends each)
      assert(user7.size == 2, user7.toString)
    } finally q.stop()
  }
}
