package graft.sources

import graft.GraftSpark
import graft.pipeline.{ApiSource, Extract}
import org.scalatest.funsuite.AnyFunSuite

/** Shared state for the reflectively-instantiated test fetcher. local-mode
  * executors share the JVM, so statics reach the reader; a cluster
  * deployment's fetcher would carry its own config (endpoint, credentials)
  * instead.
  */
object FixtureState {
  @volatile var pages: Map[Int, ApiSource.FetchResult] = Map.empty
  @volatile var meas: Map[Long, ApiSource.FetchResult] = Map.empty
}

/** No-arg fetcher for the `fetcher` class-name option. */
class StaticFixtureFetcher extends ApiSource.PageFetcher {
  def fetchLocationsPage(countriesId: Int, limit: Int, page: Int): ApiSource.FetchResult =
    FixtureState.pages.getOrElse(page, ApiSource.Page(Nil))
  def fetchMeasurements(sensorId: Long, dateFrom: String, dateTo: String,
      limit: Int): ApiSource.FetchResult =
    FixtureState.meas.getOrElse(sensorId, ApiSource.HttpError(404, "gone"))
}

class OpenAqSourceSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val fetcherName = classOf[StaticFixtureFetcher].getName

  private def locJson(id: Long, sensorId: Long) =
    s"""{"id":$id,"name":"L$id","locality":"Hanoi","timezone":"Asia/Bangkok",
        "country":{"id":56,"code":"VN","name":"Vietnam"},
        "coordinates":{"latitude":21.0,"longitude":105.8},
        "sensors":[{"id":$sensorId,"name":"s","parameter":
          {"id":2,"name":"pm25","units":"µg/m³","displayName":"PM2.5"}}],
        "datetimeLast":{"utc":"2024-01-19T00:00:00Z","local":"x"}}"""
      .replaceAll("\n\\s*", "")

  private val measJson =
    """{"value":42.5,"parameter":{"id":2,"name":"pm25","units":"µg/m³","displayName":"PM2.5"},
        "period":{"label":"1h","interval":"01:00:00",
          "datetimeFrom":{"utc":"2024-01-19T10:00:00Z","local":"x"},
          "datetimeTo":{"utc":"2024-01-19T11:00:00Z","local":"x"}},
        "coordinates":{"latitude":21.0,"longitude":105.8}}""".replaceAll("\n\\s*", "")

  test("format(\"openaq\") measurements: partitioned fetch, typed flatten, skip-on-error") {
    FixtureState.meas = Map(
      11L -> ApiSource.Page(Seq(measJson, measJson)),
      12L -> ApiSource.Page(Seq(measJson)),
      13L -> ApiSource.HttpError(429, "rate limited"))
    val df = OpenAqSource.measurements(spark, fetcherName,
      sensorIds = Seq(11L, 12L, 13L), dateFrom = "2024-01-19T00:00:00Z",
      dateTo = "2024-01-20T00:00:00Z", numPartitions = 2)
    val rows = df.collect()
    assert(rows.length == 3) // 2 + 1, sensor 13 skipped not fatal
    assert(rows.forall(_.getAs[String]("datetime") == "2024-01-19T10:00:00Z"))
    assert(rows.map(_.getAs[Long]("sensor_id")).sorted.toSeq == Seq(11L, 11L, 12L))
    // the raw scan spreads over the requested partitions
    val raw = spark.read.format("openaq").option("fetcher", fetcherName)
      .option("sensorIds", "11,12,13").option("numPartitions", "2").load()
    assert(raw.rdd.getNumPartitions == 2)
  }

  test("format(\"openaq\") locations: serial pagination in one partition, declared-schema parse") {
    FixtureState.pages = Map(
      1 -> ApiSource.Page(Seq(locJson(1, 11), locJson(2, 12))),
      2 -> ApiSource.Page(Seq(locJson(3, 13))))
    val df = OpenAqSource.locations(spark, fetcherName)
    assert(df.count() == 3)
    val raw = spark.read.format("openaq").option("endpoint", "locations")
      .option("fetcher", fetcherName).load()
    assert(raw.rdd.getNumPartitions == 1) // pagination cannot parallelize
    // downstream enrichment plane is shared with the fixture-file path
    val dim = Extract.sensorDimension(df)
    assert(dim.select("sensor_id").as[Long].collect().sorted.toSeq ==
      Seq(11L, 12L, 13L))
  }

  test("missing fetcher option fails fast with a clear message") {
    val e = intercept[Exception] {
      spark.read.format("openaq").load().collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("fetcher")))
  }
}
