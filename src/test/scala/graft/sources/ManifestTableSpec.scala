package graft.sources

import graft.GraftSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[ManifestTable]]'s protocol guarantees, each exercised through the
  * failure it exists to close: crash-between-stages invisibility,
  * idempotent re-commit (the reference's append-duplicate gap),
  * append composition, concurrent-reader retention, time travel, and
  * the vacuum orphan collector.
  */
class ManifestTableSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft-manifest").toString

  private def df(lo: Int, hi: Int) =
    spark.range(lo, hi).select(col("id"), (col("id") * 2).as("v"))

  test("replace commit + read roundtrip; versions monotonic") {
    val dir = tmpTable()
    assert(ManifestTable.commit(df(0, 10), dir, "c1") == 1L)
    assert(ManifestTable.read(spark, dir).count() == 10)
    assert(ManifestTable.commit(df(0, 25), dir, "c2") == 2L)
    assert(ManifestTable.read(spark, dir).count() == 25)
    assert(ManifestTable.snapshots(spark, dir).map(_.version) == Seq(1L, 2L))
  }

  test("idempotent re-commit: same commitId is a no-op returning the old version") {
    val dir = tmpTable()
    assert(ManifestTable.commit(df(0, 10), dir, "daily-2024-01-07") == 1L)
    // the scheduler retried the job with different (buggy, larger) data —
    // the table must NOT change and no new version may appear
    assert(ManifestTable.commit(df(0, 99), dir, "daily-2024-01-07") == 1L)
    assert(ManifestTable.read(spark, dir).count() == 10)
    assert(ManifestTable.snapshots(spark, dir).size == 1)
    // and the duplicate's staged files were collected, not leaked into data/
    assert(ManifestTable.vacuum(spark, dir) == 0)
  }

  test("append mode composes file lists; replace resets them") {
    val dir = tmpTable()
    ManifestTable.commit(df(0, 10), dir, "a1", mode = "append")
    ManifestTable.commit(df(10, 30), dir, "a2", mode = "append")
    assert(ManifestTable.read(spark, dir).count() == 30)
    ManifestTable.commit(df(0, 5), dir, "r1", mode = "replace")
    assert(ManifestTable.read(spark, dir).count() == 5)
  }

  test("crash between data write and manifest publish is invisible; vacuum collects") {
    val dir = tmpTable()
    ManifestTable.commit(df(0, 10), dir, "c1")
    // simulate the crash: data files land under data/<uuid> but the
    // manifest rename never happens
    df(0, 999).write.parquet(s"$dir/data/crashed-uuid")
    assert(ManifestTable.read(spark, dir).count() == 10)
    // ...and a crash even earlier, mid-staging
    df(0, 7).write.parquet(s"$dir/.staging/crashed-uuid-2")
    assert(ManifestTable.read(spark, dir).count() == 10)
    assert(ManifestTable.vacuum(spark, dir) == 2)
    assert(ManifestTable.read(spark, dir).count() == 10)
  }

  test("concurrent reader: a pinned version survives a later replace (until vacuum)") {
    val dir = tmpTable()
    ManifestTable.commit(df(0, 10), dir, "c1")
    val pinned = ManifestTable.readVersion(spark, dir, 1L)
    ManifestTable.commit(df(0, 3), dir, "c2", mode = "replace")
    // the old snapshot's files still exist — the pinned frame re-executes fine
    assert(pinned.count() == 10)
    assert(ManifestTable.read(spark, dir).count() == 3)
    // vacuum keeps BOTH: v1 is still a referenced manifest (time travel)
    assert(ManifestTable.vacuum(spark, dir) == 0)
    assert(ManifestTable.readVersion(spark, dir, 1L).count() == 10)
  }

  test("commitId validation: separators that would break the filename encoding") {
    val dir = tmpTable()
    intercept[IllegalArgumentException](ManifestTable.commit(df(0, 1), dir, ""))
    intercept[IllegalArgumentException](ManifestTable.commit(df(0, 1), dir, "a/b"))
    intercept[IllegalArgumentException](ManifestTable.commit(df(0, 1), dir, "a__b"))
  }
}
