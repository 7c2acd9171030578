package graft.queries

import graft.{GraftSpark, SparkEntry, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Claims of the newer catalog entries that the DuckDB oracle cannot
  * check (sketch error bounds, stream/batch parity, stub invariants).
  */
class CatalogExtraSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q55: HLL approx distinct within the query's own 5% bound") {
    val rows = SparkEntry.queries("q55_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"),
        s"${r.getAs[String]("event_type")}: approx outside 5% of " +
          s"exact=${r.getAs[Long]("exact_users")}")
    }
  }

  test("q48: streaming windowed aggregate equals the batch computation") {
    val streamed = SparkEntry.queries("q48_stream_hour_agg")(spark, sf)
    val batch = Tables.load(spark, sf, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("cnt"),
           (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0)
             .as("sum_value"))
      .orderBy("hour")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("q50: static-map categories partition all event types with fallback") {
    val rows = SparkEntry.queries("q50_static_map_join")(spark, sf).collect()
    val cats = rows.map(_.getAs[String]("category")).toSet
    assert(cats == Set("engagement", "conversion", "other"))
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.load(spark, sf, "events").count())
  }

  test("q58: hash split is deterministic, complete, and near the target fraction") {
    val docs = Tables.load(spark, sf, "documents")
    val once = SparkEntry.queries("q58_hash_split")(spark, sf).collect()
    val again = SparkEntry.queries("q58_hash_split")(spark, sf).collect()
    assert(once.toSeq == again.toSeq)
    val bySplit = once.map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = bySplit.values.sum
    assert(total == docs.count())
    val trainFrac = bySplit("train").toDouble / total
    assert(math.abs(trainFrac - 0.8) < 0.1, s"train fraction $trainFrac")
  }

  test("q46: tripled corpus collapses to one component per base doc") {
    val comp = SparkEntry.queries("q46_dup_clusters")(spark, sf)
    val nDocs = Tables.load(spark, sf, "documents").count()
    assert(comp.count() == 3 * nDocs)
    // every component label is a base doc id; sizes are multiples of 3
    // (3 per text-equal base doc — base corpora at larger sf contain dups)
    val sizes = comp.groupBy("component").count().collect()
    assert(sizes.forall(_.getAs[Long]("count") % 3 == 0))
    assert(sizes.forall(_.getAs[Long]("component") < 100000))
  }
}
