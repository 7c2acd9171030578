package graft.pipeline

import graft.GraftSpark
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SinkSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("writeHourlyNdjson lays out the raw-zone hour-keyed directories") {
    val out = Files.createTempDirectory("graft-hourly").toFile.getAbsolutePath + "/raw"
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-15 03:00:00"), 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-15 14:30:00"), 2.0))
      .toDF("id", "ts", "v")
    Sink.writeHourlyNdjson(df, "ts", out)
    assert(new java.io.File(s"$out/y=2024/m=01/d=15/h=03").exists())
    assert(new java.io.File(s"$out/y=2024/m=01/d=15/h=14").exists())
    val back = spark.read.json(out)
    assert(back.count() == 2)
    // partition cols live in the path, not file content — but are recovered
    assert(back.columns.contains("h"))
  }

  test("overwrite-dynamic replaces only touched partitions (idempotent reruns)") {
    val out = Files.createTempDirectory("graft-dyn").toFile.getAbsolutePath + "/mart"
    def batch(day: String, v: Double) = Seq((1L, day, v))
      .toDF("id", "day", "v")
    Sink.writePartitioned(batch("d1", 1.0), out, Seq("day"), "append")
    Sink.writePartitioned(batch("d2", 2.0), out, Seq("day"), "append")
    // re-run day d1 with corrected data in dynamic-overwrite mode
    Sink.writePartitioned(batch("d1", 9.0), out, Seq("day"), "overwrite-dynamic")
    val back = spark.read.parquet(out)
    assert(back.count() == 2) // no duplicate d1 rows
    assert(back.filter($"day" === "d1").head().getAs[Double]("v") == 9.0)
    assert(back.filter($"day" === "d2").count() == 1) // untouched partition survives
  }

  test("compactPartitions merges append-accreted small files, scoped by predicate") {
    val out = Files.createTempDirectory("graft-compact").toFile.getAbsolutePath + "/mart"
    // ZERO-PADDED NUMERIC strings on purpose: bare partition discovery
    // would infer day='01' back to int 1 and compaction would rewrite into
    // a new day=1 directory, duplicating rows — the mart's real layout
    // (lpad'ed month/day) is exactly this shape
    def batch(day: String, v: Double) = Seq((1L, day, v), (2L, day, v + 1))
      .toDF("id", "day", "v")
    for (i <- 1 to 3) {
      Sink.writePartitioned(batch("01", i * 1.0), out, Seq("day"), "append")
      Sink.writePartitioned(batch("02", i * 10.0), out, Seq("day"), "append")
    }
    def parquetFiles(day: String) =
      new java.io.File(s"$out/day=$day").listFiles
        .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles("01") >= 3)
    val d2FilesBefore = parquetFiles("02")
    val before = spark.read.schema("id LONG, v DOUBLE, day STRING")
      .parquet(out).orderBy("day", "id", "v").collect().toSeq
    // compact ONLY day 01 — day 02's files must remain untouched
    Sink.compactPartitions(spark, out, Seq("day"),
      partitionPredicate = Some("day = '01'"))
    assert(parquetFiles("01") == 1) // merged, SAME day=01 directory
    assert(!new java.io.File(s"$out/day=1").exists()) // no re-typed dir
    assert(parquetFiles("02") == d2FilesBefore) // out of scope, untouched
    val after = spark.read.schema("id LONG, v DOUBLE, day STRING")
      .parquet(out).orderBy("day", "id", "v").collect().toSeq
    assert(after == before) // compaction moves bytes, never rows
    // layoutStats reads the same truth a compaction policy would act on
    val stats = Sink.layoutStats(spark, out)
      .orderBy("partition").as[(String, Long, Long)].collect().toSeq
    assert(stats.map(s => s._1 -> s._2) ==
      Seq("day=01" -> 1L, "day=02" -> d2FilesBefore.toLong))
    assert(stats.forall(_._3 > 0))
  }

  test("schema evolution: mergeSchema unifies batches with added columns") {
    // the reference's schema pains (VoidType, drifting raw payloads) also
    // show up at the parquet layer when a new field starts arriving —
    // mergeSchema is the read-side contract for that
    val out = Files.createTempDirectory("graft-evolve").toFile.getAbsolutePath + "/t"
    Seq((1L, "a")).toDF("id", "x").write.mode("append").parquet(out)
    Seq((2L, "b", 9.5)).toDF("id", "x", "score").write.mode("append").parquet(out)
    val merged = spark.read.option("mergeSchema", true).parquet(out)
    assert(merged.columns.sorted.toSeq == Seq("id", "score", "x"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score"))) // old rows: null
    assert(rows(1).getDouble(rows(1).fieldIndex("score")) == 9.5)
  }

  test("writeWrapped emits the {meta,results} envelope round-trippable by readLocations-style readers") {
    val out = Files.createTempDirectory("graft-wrap").toFile.getAbsolutePath + "/wrapped"
    val df = Seq((1L, "pm25", 4.5), (2L, "pm10", 8.0)).toDF("sensor_id", "parameter", "value")
    Sink.writeWrapped(df, out, "openaq-api", java.sql.Timestamp.valueOf("2024-01-20 00:00:00"))
    val env = spark.read.option("multiLine", true).json(out)
    val row = env.head()
    assert(row.getAs[org.apache.spark.sql.Row]("meta").getAs[Long]("found") == 2L)
    assert(env.select(explode($"results")).count() == 2)
  }

  test("partitioned mart prunes partitions for string month/day filters") {
    val out = Files.createTempDirectory("graft-prune").toFile.getAbsolutePath + "/mart"
    val df = Seq(
      (1L, 2024, "01", "15", 10.0),
      (2L, 2024, "01", "16", 11.0),
      (3L, 2024, "02", "01", 12.0))
      .toDF("id", "year", "month", "day", "pm25")
    Sink.writePartitioned(df, out, Seq("year", "month", "day"), "overwrite")
    val q = spark.read.parquet(out)
      .filter($"year" === 2024 && $"month" === "01" && $"day" === "15")
    val scan = q.queryExecution.executedPlan.toString
    // partition filters reach the scan — only the one directory is read
    assert(scan.contains("PartitionFilters"))
    assert(q.count() == 1)
    // the SURVEY §7.4#5 hazard, Spark flavor: partition discovery re-infers
    // the zero-padded "01" directory value as INTEGER 1 (the Glue crawler
    // keeps it a string). With inference disabled the mart contract's
    // string type is preserved and the '1' vs '01' mismatch appears.
    assert(q.schema("month").dataType == org.apache.spark.sql.types.IntegerType)
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    try {
      val strTyped = spark.read.parquet(out)
      assert(strTyped.schema("month").dataType == org.apache.spark.sql.types.StringType)
      assert(strTyped.filter($"month" === "1").count() == 0)
      assert(strTyped.filter($"month" === "01").count() == 2)
    } finally
      spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "true")
  }

  test("bucketed table joins without an exchange on the bucket key") {
    val facts = (1L to 1000L).map(i => (i % 50, i.toDouble)).toDF("k", "v")
    Sink.writeBucketed(facts, "bucketed_facts", "k", numBuckets = 8)
    val t = spark.table("bucketed_facts")
    val agg = t.groupBy("k").agg(sum("v"))
    // bucketed layout satisfies the aggregation's distribution — no shuffle
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(agg.count() == 50)
    spark.sql("DROP TABLE bucketed_facts")
  }

  test("two same-bucketed tables sort-merge join with zero exchanges") {
    val facts = (1L to 1000L).map(i => (i % 50, i.toDouble)).toDF("k", "v")
    val dim = (0L until 50L).map(i => (i, s"g${i % 3}")).toDF("k", "g")
    Sink.writeBucketed(facts, "bkt_join_facts", "k", 8, sortCol = Some("k"))
    Sink.writeBucketed(dim, "bkt_join_dim", "k", 8, sortCol = Some("k"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_join_facts")
        .join(spark.table("bkt_join_dim"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE bkt_join_facts")
      spark.sql("DROP TABLE bkt_join_dim")
    }
  }
}
