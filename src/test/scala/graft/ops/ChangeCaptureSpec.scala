package graft.ops

import graft.GraftSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChangeCaptureSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("scd2 collapses runs into versioned validity intervals") {
    // key 1: A,A,B,B,A -> 3 intervals; key 2: one open interval.
    val log = Seq(
      (1L, 1L, Some("A")), (1L, 2L, Some("A")), (1L, 3L, Some("B")),
      (1L, 4L, Some("B")), (1L, 5L, Some("A")),
      (2L, 1L, Some("X")))
      .toDF("k", "seq", "attr")
    val out = ChangeCapture.scd2(log, "k", "attr", col("seq"), col("seq"))
      .orderBy("k", "version")
      .select("k", "version", "attr", "valid_from", "valid_to", "is_current")
      .collect().map(_.toSeq)
    assert(out.toSeq == Seq(
      Seq(1L, 1L, "A", 1L, 3L, false),
      Seq(1L, 2L, "B", 3L, 5L, false),
      Seq(1L, 3L, "A", 5L, null, true),
      Seq(2L, 1L, "X", 1L, null, true)))
  }

  test("scd2 treats NULL as a distinct state and breaks seq ties") {
    // NULL attr opens its own interval (null-safe change detection);
    // two rows at seq=2 are ordered by the tie column.
    val log = Seq(
      (1L, 1L, 10L, Some("A")), (1L, 2L, 20L, Option.empty[String]),
      (1L, 2L, 30L, Some("B")), (1L, 3L, 40L, Some("B")))
      .toDF("k", "seq", "tie", "attr")
    val out = ChangeCapture.scd2(log, "k", "attr", col("seq"), col("tie"))
      .orderBy("version")
      .select("version", "attr", "valid_from", "valid_to", "is_current")
      .collect().map(_.toSeq)
    assert(out.toSeq == Seq(
      Seq(1L, "A", 1L, 2L, false),
      Seq(2L, null, 2L, 2L, false),
      Seq(3L, "B", 2L, null, true)))
  }

  test("scd2Merge(compact(old), new) == compact(all) on random histories") {
    val rnd = new scala.util.Random(11)
    // duplicate seqs per key are deliberate (tie column disambiguates);
    // the split at seq 50 is strict, so no equal-seq boundary straddle
    val log = (1L to 400L).map { i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(100).toLong + 1, i,
        Seq("A", "B", "C")(rnd.nextInt(3)))
    }.toDF("k", "seq", "tie", "attr")
    val outCols = Seq("k", "version", "attr", "valid_from", "valid_to",
      "is_current")
    val full = ChangeCapture.scd2(log, "k", "attr", col("seq"), col("tie"))
      .select(outCols.map(col): _*)
    val dim = ChangeCapture.scd2(log.filter(col("seq") <= 50),
      "k", "attr", col("seq"), col("tie"))
    val merged = ChangeCapture.scd2Merge(dim, log.filter(col("seq") > 50),
      "k", "attr", col("seq"), col("tie"))
      .select(outCols.map(col): _*)
    assert(graft.GraftSpark.collectSet(merged) == graft.GraftSpark.collectSet(full))
  }

  test("scd2Merge keeps the batch tie's own type (numeric strings stay lexicographic)") {
    // seq ties inside the batch break by STRING tie: '10' < '9'
    // lexicographically — a cast-to-long would invert them (and throw
    // under ANSI for non-numeric ids)
    val dim = ChangeCapture.scd2(
      Seq((1L, 1L, "e1", "A")).toDF("k", "seq", "tie", "attr"),
      "k", "attr", col("seq"), col("tie"))
    val merged = ChangeCapture.scd2Merge(dim,
      Seq((1L, 5L, "9", "C"), (1L, 5L, "10", "B")).toDF("k", "seq", "tie", "attr"),
      "k", "attr", col("seq"), col("tie"))
      .orderBy("version").select("version", "attr").collect().map(_.toSeq)
    assert(merged.toSeq == Seq(Seq(1L, "A"), Seq(2L, "B"), Seq(3L, "C")))
  }

  test("scd2Merge extends the open interval when the batch repeats the current attr") {
    val dim = ChangeCapture.scd2(
      Seq((1L, 1L, 1L, "A")).toDF("k", "seq", "tie", "attr"),
      "k", "attr", col("seq"), col("tie"))
    val merged = ChangeCapture.scd2Merge(dim,
      Seq((1L, 5L, 1L, "A"), (1L, 9L, 2L, "B")).toDF("k", "seq", "tie", "attr"),
      "k", "attr", col("seq"), col("tie"))
      .orderBy("version")
      .select("version", "attr", "valid_from", "valid_to", "is_current")
      .collect().map(_.toSeq)
    // no spurious version at seq 5; B opens at 9
    assert(merged.toSeq == Seq(
      Seq(1L, "A", 1L, 9L, false),
      Seq(2L, "B", 9L, null, true)))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged (null-safe)") {
    val before = Seq(
      (1L, Some(10.0), "x"), (2L, Some(20.0), "y"),
      (3L, Some(30.0), "z"), (5L, Option.empty[Double], "n"))
      .toDF("k", "v", "s")
    val after = Seq(
      (2L, Some(25.0), "y"), (3L, Some(30.0), "z"),
      (4L, Some(40.0), "w"), (5L, Option.empty[Double], "n"))
      .toDF("k", "v", "s")
    val got = ChangeCapture.snapshotDiff(before, after, "k", Seq("v", "s"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "changed", 3L -> "unchanged",
      4L -> "added", 5L -> "unchanged"))
  }

  test("applyCdc: last change wins; upsert, delete, insert, passthrough") {
    val base = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
      .toDF("k", "v", "extra")
    // key 1: U then (later) D -> deleted; key 2: out-of-order U, seq 5
    //   wins -> v=29; key 4: I -> inserted with NULL extra; key 5: D on a
    //   missing key -> no output row.
    val changes = Seq(
      (1L, "U", 11.0, 1L, 1L), (1L, "D", 0.0, 2L, 1L),
      (2L, "U", 29.0, 5L, 1L), (2L, "U", 21.0, 3L, 2L),
      (4L, "I", 40.0, 1L, 1L), (5L, "D", 0.0, 1L, 1L))
      .toDF("k", "op", "v", "seq", "tie")
    val out = ChangeCapture.applyCdc(base, changes, "k", "op",
        col("seq"), col("tie"), Seq("v"))
      .orderBy("k").collect().map(_.toSeq)
    assert(out.toSeq == Seq(
      Seq(2L, 29.0, "b"),
      Seq(3L, 30.0, "c"),
      Seq(4L, 40.0, null)))
  }

  test("snapshotDiff surfaces a change TO NULL as NULL, not the stale value") {
    val before = Seq((1L, Some(10.0))).toDF("k", "v")
    val after = Seq((1L, Option.empty[Double])).toDF("k", "v")
    val row = ChangeCapture.snapshotDiff(before, after, "k", Seq("v"))
      .collect()(0)
    assert(row.getString(1) == "changed")
    assert(row.isNullAt(2), "after-side NULL must win over the before value")
  }

  test("applyCdc: a winning U change with NULL value clears the field") {
    val base = Seq((1L, Some(10.0))).toDF("k", "v")
    val changes = Seq((1L, "U", Option.empty[Double], 1L, 1L))
      .toDF("k", "op", "v", "seq", "tie")
    val out = ChangeCapture.applyCdc(base, changes, "k", "op",
      col("seq"), col("tie"), Seq("v")).collect()
    assert(out.length == 1 && out(0).isNullAt(1),
      "NULL in a winning change must replace, not retain, the base value")
  }

  test("applyCdc equal-seq ties resolve by the tie column") {
    val base = Seq((1L, 0.0)).toDF("k", "v")
    val changes = Seq((1L, "U", 7.0, 1L, 2L), (1L, "U", 5.0, 1L, 1L))
      .toDF("k", "op", "v", "seq", "tie")
    val out = ChangeCapture.applyCdc(base, changes, "k", "op",
      col("seq"), col("tie"), Seq("v")).collect()
    assert(out.length == 1 && out(0).getDouble(1) == 7.0)
  }
}
