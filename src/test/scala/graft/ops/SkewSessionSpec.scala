package graft.ops

import graft.GraftSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private lazy val skewed = (Seq.fill(1000)("hot") ++ Seq("a", "b", "c"))
    .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("key", "v")

  test("saltedCount equals plain groupBy count") {
    val salted = Skew.saltedCount(skewed, Seq("key"), saltBuckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = skewed.groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("hot") == 1000L)
  }

  test("saltedAgg two-phase sum equals plain sum") {
    val salted = Skew.saltedAgg(skewed, Seq("key"), 8)(
      Seq(sum("v").as("__s")), Seq(sum("__s").as("total")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = skewed.groupBy("key").agg(sum("v").as("total"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain join despite hot key") {
    val dim = Seq(("hot", "H"), ("a", "A"), ("b", "B")).toDF("key", "label")
    val salted = Skew.saltedJoin(skewed, dim, "key").groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = skewed.join(dim, Seq("key")).groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(salted("H") == 1000L)
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true)") {
    import spark.implicits._
    // one mega-key holding half the rows; thresholds lowered so the
    // local data qualifies as skewed (prod defaults are 256 MB-scale)
    val overrides = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
    overrides.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = (1L to 40000L)
        .map(i => (if (i % 2 == 0) 0L else i % 500, s"payload_$i"))
        .toDF("k", "v")
      val right = (0L until 500L).map(i => (i, s"dim_$i")).toDF("k", "g")
      val joined = left.join(right, "k").groupBy("g")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      val rows = joined.collect() // AQE decides at runtime — materialize first
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a runtime skew-split SMJ in:\n$plan")
      // the VALUES through the skew-split path, not just the plan shape:
      // a mis-merged split would drop or double hot-key rows. Even i →
      // mega-key 0 (20,000 rows); odd i → odd i%500 (80 each); even
      // dims other than 0 never occur.
      val counts = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts("dim_0") == 20000L, s"hot key: ${counts.get("dim_0")}")
      assert(counts("dim_1") == 80L && counts("dim_499") == 80L)
      assert(!counts.contains("dim_2"))
      assert(counts.values.sum == 40000L)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("hotKeys surfaces the dominant key") {
    val hot = Skew.hotKeys(skewed, "key", minFraction = 0.5).collect()
    assert(hot.length == 1 && hot.head.getString(0) == "hot")
  }
}

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1.0),
    (1L, ts("2024-01-01 10:10:00"), 2.0),
    (1L, ts("2024-01-01 11:30:00"), 3.0),  // > 30 min gap → new session
    (2L, ts("2024-01-01 09:00:00"), 4.0))
    .toDF("user_id", "ts", "value")

  test("batch sessionization splits on gap and aggregates per session") {
    val s = Sessionize.sessionSummaries(events).orderBy("user_id", "session_id").collect()
    assert(s.length == 3)
    assert(s(0).getAs[Long]("n_events") == 2 && s(0).getAs[Double]("sum_value") == 3.0)
    assert(s(1).getAs[Long]("n_events") == 1)
    assert(s(2).getAs[Long]("user_id") == 2L)
  }

  test("streaming sessionization emits closed sessions via state timeout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toFile
    def land(name: String, rows: Seq[String]): Unit =
      java.nio.file.Files.write(new java.io.File(dir, name).toPath,
        rows.mkString("\n").getBytes("UTF-8"))
    land("b1.json", Seq(
      """{"user_id":1,"ts":"2024-01-01T10:00:00Z","value":1.0}""",
      """{"user_id":1,"ts":"2024-01-01T10:10:00Z","value":2.0}"""))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema).json(dir.getAbsolutePath)
    val sessions = Sessionize.streamingSessions(spark, stream,
      gapMinutes = 30, watermark = "10 minutes")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      // watermark hasn't passed the gap yet — nothing closed
      assert(spark.table("sess_out").count() == 0)
      // an event far in the future advances the watermark past 10:10+30m
      land("b2.json", Seq(
        """{"user_id":2,"ts":"2024-01-01 14:00:00","value":9.0}"""))
      q.processAllAvailable()
      q.processAllAvailable()
      val closed = spark.table("sess_out").collect()
      assert(closed.exists(r => r.getAs[Long]("user_id") == 1L &&
        r.getAs[Long]("n_events") == 2L && r.getAs[Double]("sum_value") == 3.0))
    } finally q.stop()
  }
}
