package graft.pipeline

import graft.GraftSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants over the pipeline operators (SURVEY §5 port
  * plan): dedup idempotence, pivot cardinality bounds, partition-column /
  * event-time agreement — on ScalaCheck-generated measurement batches
  * (seeded, driven manually: only scalatest + scalacheck are on the
  * offline classpath, no scalatestplus bridge).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val rowGen = for {
    loc <- Gen.choose(1L, 5L)
    hourOffset <- Gen.choose(0, 71)
    param <- Gen.oneOf("pm25", "pm10", "no2")
    value <- Gen.choose(0.0, 300.0)
  } yield (loc, f"2024-01-${1 + hourOffset / 24}%02dT${hourOffset % 24}%02d:00:00+07:00", param, value)

  private val batchGen = Gen.listOfN(60, rowGen)

  private def batches(n: Int): Seq[List[(Long, String, String, Double)]] =
    (1 to n).map(i => batchGen.apply(Gen.Parameters.default, Seed(i.toLong)).get)

  test("dedup is idempotent and keeps exactly one row per key") {
    batches(5).foreach { rows =>
      val df = rows.toDF("location_id", "datetime", "parameter", "value")
        .transform(Transforms.parseDatetime)
      val once = df.transform(Transforms.dedupByRank(
        Seq("location_id", "datetime"), Seq(col("parameter"), col("value"))))
      val twice = once.transform(Transforms.dedupByRank(
        Seq("location_id", "datetime"), Seq(col("parameter"), col("value"))))
      val keys = df.select("location_id", "datetime").distinct().count()
      assert(once.count() == keys)
      assert(twice.count() == keys)
    }
  }

  test("pivot output rows equal distinct grouping keys; values bounded by input") {
    batches(5).foreach { rows =>
      val df = rows.toDF("location_id", "datetime", "parameter", "value")
        .transform(Transforms.parseDatetime)
        .transform(Transforms.derivePartitions)
      val pivoted = df.transform(Transforms.pivotParameters(
        values = Some(Seq("pm25", "pm10", "no2"))))
      val keys = df.select("location_id", "datetime").distinct().count()
      assert(pivoted.count() == keys)
      val maxIn = df.agg(max("value")).head().getDouble(0)
      val maxOut = pivoted.agg(greatest(max("pm25"), max("pm10"), max("no2")))
        .head().getDouble(0)
      assert(maxOut <= maxIn + 1e-9) // means never exceed the max input
    }
  }

  test("partition columns always agree with the UTC event time") {
    batches(5).foreach { rows =>
      val df = rows.toDF("location_id", "datetime", "parameter", "value")
        .transform(Transforms.parseDatetime)
        .transform(Transforms.derivePartitions)
      val mismatches = df.filter(
        col("year") =!= year(col("datetime")) ||
        col("month") =!= lpad(month(col("datetime")).cast("string"), 2, "0") ||
        col("day") =!= lpad(dayofmonth(col("datetime")).cast("string"), 2, "0"))
      assert(mismatches.count() == 0)
    }
  }
}
