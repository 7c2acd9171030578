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

  test("cents truncation equals half-up rounding for every 2-dp double") {
    // guards the Catalog `cents` fast path: (x*100 + signum(x)*0.5) cast to
    // long must recover exactly n for x = n/100, including negatives and
    // values whose double rendering sits just below the integer
    val centsGen = Gen.choose(-1000000000L, 1000000000L)
    val ns = Gen.listOfN(4000, centsGen)
      .apply(Gen.Parameters.default, Seed(7L)).get
    val df = ns.toDF("n")
      .withColumn("x", col("n").cast("double") / 100.0)
      .withColumn("back", (col("x") * 100 + signum(col("x")) * 0.5).cast("long"))
    assert(df.filter(col("back") =!= col("n")).count() == 0)
    // and the scaled-integer revenue identity: price*(1-d)*1e4 cents-exact
    val rev = ns.take(1000).toDF("n")
      .withColumn("price", abs(col("n").cast("double") / 100.0))
      .withColumn("disc", (abs(col("n")) % 100).cast("double") / 100.0)
      .withColumn("pc", (col("price") * 100 + signum(col("price")) * 0.5).cast("long"))
      .withColumn("dc", (col("disc") * 100 + signum(col("disc")) * 0.5).cast("long"))
      .filter(col("pc") =!= abs(col("n")) || col("dc") =!= abs(col("n")) % 100)
    assert(rev.count() == 0)
  }
}
