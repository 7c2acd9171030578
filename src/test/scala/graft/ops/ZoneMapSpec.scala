package graft.ops

import graft.GraftSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZoneMapSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  /** Range-partitioned multi-file table: 1000 rows over key 0..999 in 8
    * files, so a narrow key predicate can only touch 1-2 files.
    */
  private lazy val tableDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("zonemap").toString
    (0 until 1000).map(i => (i.toLong, s"payload-$i"))
      .toDF("key", "payload")
      .repartitionByRange(8, col("key"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("stats cover every file and the full row count") {
    val stats = ZoneMap.fileStats(spark.read.parquet(tableDir), col("key"))
    val rows = stats.collect()
    assert(rows.length === 8)
    assert(rows.map(_.getAs[Long]("n_rows")).sum === 1000L)
  }

  test("a narrow predicate prunes most files") {
    val stats = ZoneMap.fileStats(spark.read.parquet(tableDir), col("key"))
    val files = ZoneMap.overlappingFiles(stats, lit(100L), lit(120L))
    assert(files.nonEmpty && files.size <= 2,
      s"expected <= 2 of 8 files, got ${files.size}")
  }

  test("pruned read equals the full-scan filter") {
    val full = spark.read.parquet(tableDir)
      .filter(col("key").between(100L, 120L))
      .select("key", "payload").as[(Long, String)].collect().sortBy(_._1)
    val pruned = ZoneMap.prunedRead(spark, tableDir, "key", lit(100L), lit(120L))
      .select("key", "payload").as[(Long, String)].collect().sortBy(_._1)
    assert(pruned === full && pruned.length === 21)
  }

  test("stats rows can straddle the predicate: residual filter still applies") {
    // [795, 805] straddles a file boundary — both files read, only the 11
    // matching rows survive
    val out = ZoneMap.prunedRead(spark, tableDir, "key", lit(795L), lit(805L))
      .select("key").as[Long].collect().sorted
    assert(out === (795L to 805L).toArray)
  }

  test("an empty overlap returns an empty result with the table schema") {
    val out = ZoneMap.prunedRead(spark, tableDir, "key", lit(5000L), lit(6000L))
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("key", "payload"))
  }
}
