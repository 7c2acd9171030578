package graft.pipeline

import graft.GraftSpark
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Extraction-side specs (SURVEY §3.2): locations flatten, active-sensor
  * filter with parameter normalization (the PM2.5/pm25 HCMC bug fix),
  * sensor-dimension build with the city fallback chain, enrichment join.
  */
class ExtractSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  // wrapped-envelope locations fixture (FIXTURES F3/F4 shape)
  private val locationsJson =
    """{"meta":{"name":"openaq-api","website":"x","found":3,"extracted_at":"2024-01-20T00:00:00Z"},
       "results":[
        {"id":18,"name":"Hanoi Station","locality":"Hanoi","timezone":"Asia/Bangkok",
         "country":{"id":56,"code":"VN","name":"Vietnam"},
         "coordinates":{"latitude":21.05,"longitude":105.8},
         "sensors":[{"id":37,"name":"pm25 µg/m³","parameter":{"id":2,"name":"PM2.5","units":"µg/m³","displayName":"PM2.5"}},
                    {"id":38,"name":"temp","parameter":{"id":9,"name":"temperature","units":"c","displayName":"Temp"}}],
         "datetimeFirst":null,
         "datetimeLast":{"utc":"2024-01-19T16:00:00Z","local":"x"}},
        {"id":3276359,"name":"HCMC Station","locality":null,"timezone":"Asia/Bangkok",
         "country":{"id":56,"code":"VN","name":"Vietnam"},
         "coordinates":{"latitude":10.78,"longitude":106.7},
         "sensors":[{"id":99,"name":"pm25","parameter":{"id":2,"name":"pm25","units":"µg/m³","displayName":"PM2.5"}}],
         "datetimeFirst":null,
         "datetimeLast":{"utc":"2024-01-19T12:00:00Z","local":"x"}},
        {"id":500,"name":"Stale Station","locality":null,"timezone":"Asia/Bangkok",
         "country":{"id":56,"code":"VN","name":"Vietnam"},
         "coordinates":{"latitude":1.0,"longitude":2.0},
         "sensors":[{"id":7,"name":"pm25","parameter":{"id":2,"name":"pm25","units":"µg/m³","displayName":"PM2.5"}}],
         "datetimeFirst":null,
         "datetimeLast":{"utc":"2023-06-01T00:00:00Z","local":"x"}}]}"""
      .replaceAll("\n\\s*", "")

  private lazy val locPath = {
    val dir = Files.createTempDirectory("graft-loc").toFile
    Files.write(new java.io.File(dir, "locations.json").toPath,
      locationsJson.getBytes("UTF-8"))
    dir.getAbsolutePath
  }

  private lazy val locations = Extract.readLocations(spark, locPath)

  test("readLocations explodes the wrapped envelope into one row per location") {
    assert(locations.count() == 3)
    assert(locations.select("country.code").distinct().head().getString(0) == "VN")
  }

  test("activeSensors keeps recent locations + required params, normalized (PM2.5 == pm25)") {
    val asOf = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    val active = Extract.activeSensors(locations, Seq("pm25"), asOf)
    // sensor 37 qualifies via 'PM2.5' normalization; temp excluded;
    // stale location (datetimeLast 2023) excluded
    assert(active.select("sensor_id").as[Long].collect().toSet == Set(37L, 99L))
    assert(active.filter($"sensor_id" === 37L).head().getAs[String]("parameter") == "pm25")
  }

  test("sensorDimension applies the locality -> city-map -> Unknown fallback chain") {
    val dim = Extract.sensorDimension(locations)
    val bySensor = dim.collect().map(r => r.getAs[Long]("sensor_id") -> r).toMap
    assert(bySensor(37L).getAs[String]("city") == "Hanoi")           // locality
    assert(bySensor(99L).getAs[String]("city") == "Ho Chi Minh City") // static map (J3)
    assert(bySensor(7L).getAs[String]("city") == "Unknown")           // fallback
  }

  test("readWrappedMeasurements flattens the nested API capture (F3)") {
    val capture =
      """{"meta":{"name":"openaq-api","website":"x","found":2,"extracted_at":"2024-01-20T00:00:00Z"},
         "results":[
          {"value":12.5,"parameter":{"id":2,"name":"pm25","units":"µg/m³","displayName":"PM2.5"},
           "period":{"label":"1h","interval":"01:00:00",
                     "datetimeFrom":{"utc":"2024-01-19T10:00:00Z","local":"x"},
                     "datetimeTo":{"utc":"2024-01-19T11:00:00Z","local":"x"}},
           "coordinates":{"latitude":10.78,"longitude":106.7},"flagInfo":{"hasFlags":false}},
          {"value":14.0,"parameter":{"id":2,"name":"pm25","units":"µg/m³","displayName":"PM2.5"},
           "period":{"label":"1h","interval":"01:00:00",
                     "datetimeFrom":{"utc":"2024-01-19T11:00:00Z","local":"x"},
                     "datetimeTo":{"utc":"2024-01-19T12:00:00Z","local":"x"}},
           "coordinates":null,"flagInfo":{"hasFlags":false}}]}"""
        .replaceAll("\n\\s*", "")
    val dir = Files.createTempDirectory("graft-cap").toFile
    Files.write(new java.io.File(dir, "sensor_1.json").toPath, capture.getBytes("UTF-8"))
    val df = Extract.readWrappedMeasurements(spark, dir.getAbsolutePath, sensorId = 7772024L)
    assert(df.count() == 2)
    val r = df.orderBy("datetime").head()
    assert(r.getAs[Long]("sensor_id") == 7772024L)
    assert(r.getAs[String]("datetime") == "2024-01-19T10:00:00Z")
    assert(r.getAs[String]("parameter") == "pm25")
    assert(r.getAs[Double]("value") == 12.5)
  }

  test("enrichMeasurements broadcast-joins metadata with per-field defaults") {
    val dim = Extract.sensorDimension(locations)
    val measurements = Seq(
      (37L, "2024-01-19T10:00:00Z", "pm25", 42.0),
      (12345L, "2024-01-19T10:00:00Z", "pm25", 1.0)) // unknown sensor
      .toDF("sensor_id", "datetime", "parameter", "value")
    val stamped = measurements.transform(
      Extract.stampExtractedAt(java.sql.Timestamp.valueOf("2024-01-20 00:00:00")))
    assert(stamped.select("extracted_at").distinct().count() == 1)
    val enriched = Extract.enrichMeasurements(stamped, dim)
    val known = enriched.filter($"sensor_id" === 37L).head()
    assert(known.getAs[String]("city") == "Hanoi")
    assert(known.getAs[Long]("location_id") == 18L)
    val unknown = enriched.filter($"sensor_id" === 12345L).head()
    assert(unknown.getAs[String]("city") == "Unknown")
    assert(unknown.getAs[String]("country") == "VN")
    assert(unknown.getAs[Double]("latitude") == 0.0)
  }

  test("enrichMeasurements composes with wrapped captures (shared lat/lon columns)") {
    // measurements carrying their own coordinates (the S10 capture shape)
    // must not clash with the dimension's lat/lon; the measurement value
    // wins when present, the dimension fills the gap otherwise
    val dim = Extract.sensorDimension(locations)
    val measurements = Seq(
      (37L, "2024-01-19T10:00:00Z", "pm25", 42.0, Some(10.78), Some(106.7)),
      (37L, "2024-01-19T11:00:00Z", "pm25", 43.0, None, None))
      .toDF("sensor_id", "datetime", "parameter", "value", "latitude", "longitude")
    val enriched = Extract.enrichMeasurements(measurements, dim)
    val own = enriched.filter($"datetime" === "2024-01-19T10:00:00Z").head()
    assert(own.getAs[Double]("latitude") == 10.78)
    val filled = enriched.filter($"datetime" === "2024-01-19T11:00:00Z").head()
    assert(filled.getAs[Double]("latitude") == 21.05) // from the dimension
    assert(filled.getAs[String]("city") == "Hanoi")
  }

  // --- paginated live-source semantics (ApiSource), reference
  // extract_api.py:38-104 (locations) and :195-270 (measurements) ---

  private def locJson(id: Long, sensorId: Long) =
    s"""{"id":$id,"name":"L$id","locality":"Hanoi","timezone":"Asia/Bangkok",
        "country":{"id":56,"code":"VN","name":"Vietnam"},
        "coordinates":{"latitude":21.0,"longitude":105.8},
        "sensors":[{"id":$sensorId,"name":"s","parameter":
          {"id":2,"name":"pm25","units":"µg/m³","displayName":"PM2.5"}}],
        "datetimeLast":{"utc":"2024-01-19T00:00:00Z","local":"x"}}"""
       .replaceAll("\n\\s*", "")

  test("fetchAllLocations pages until the empty page and accumulates everything") {
    val fetcher = ApiSource.FixtureFetcher(
      locationPages = Map(
        1 -> ApiSource.Page(Seq(locJson(1, 11), locJson(2, 12))),
        2 -> ApiSource.Page(Seq(locJson(3, 13)))),
      measurements = Map.empty)
    val fetched = ApiSource.fetchAllLocations(fetcher, pageSize = 2)
    assert(fetched.complete && fetched.pagesFetched == 2)
    assert(fetched.rawJson.length == 3)
    val df = ApiSource.locationsDf(spark, fetched)
    assert(df.count() == 3)
    // shares the downstream with the capture-file path
    val dim = Extract.sensorDimension(df)
    assert(dim.select("sensor_id").as[Long].collect().sorted.toSeq == Seq(11L, 12L, 13L))
  }

  test("fetchAllLocations keeps earlier pages when an HTTP error cuts pagination") {
    val fetcher = ApiSource.FixtureFetcher(
      locationPages = Map(
        1 -> ApiSource.Page(Seq(locJson(1, 11))),
        2 -> ApiSource.HttpError(500, "boom"),
        3 -> ApiSource.Page(Seq(locJson(9, 99)))), // never reached
      measurements = Map.empty)
    val fetched = ApiSource.fetchAllLocations(fetcher)
    assert(!fetched.complete && fetched.rawJson.length == 1)
  }

  test("fetchAllLocations maxPages guards against a never-empty server") {
    val everFull = new ApiSource.PageFetcher {
      def fetchLocationsPage(c: Int, l: Int, p: Int) = ApiSource.Page(Seq(locJson(p, p)))
      def fetchMeasurements(s: Long, f: String, t: String, l: Int) = ApiSource.Page(Nil)
    }
    val fetched = ApiSource.fetchAllLocations(everFull, maxPages = 5)
    assert(!fetched.complete && fetched.rawJson.length == 5)
  }

  test("distributed measurement fetch flattens pages and skips failed sensors") {
    val meas =
      """{"value":42.5,"parameter":{"id":2,"name":"pm25","units":"µg/m³","displayName":"PM2.5"},
          "period":{"label":"1h","interval":"01:00:00",
            "datetimeFrom":{"utc":"2024-01-19T10:00:00Z","local":"x"},
            "datetimeTo":{"utc":"2024-01-19T11:00:00Z","local":"x"}},
          "coordinates":{"latitude":21.0,"longitude":105.8}}""".replaceAll("\n\\s*", "")
    val fetcher = ApiSource.FixtureFetcher(
      locationPages = Map.empty,
      measurements = Map(
        11L -> ApiSource.Page(Seq(meas, meas)),
        12L -> ApiSource.HttpError(429, "rate limited"))) // skipped, not fatal
    val df = ApiSource.fetchMeasurementsDistributed(
      spark, Seq(11L, 12L), fetcher, "2024-01-19T00:00:00Z", "2024-01-20T00:00:00Z")
    val rows = df.collect()
    assert(rows.length == 2 && rows.forall(_.getAs[Long]("sensor_id") == 11L))
    val r = rows.head
    assert(r.getAs[String]("datetime") == "2024-01-19T10:00:00Z")
    assert(r.getAs[String]("parameter") == "pm25" && r.getAs[Double]("value") == 42.5)
    // and the shared enrichment plane accepts this frame unchanged
    val dim = Extract.sensorDimension(ApiSource.locationsDf(spark,
      ApiSource.LocationsFetch(Seq(locJson(1, 11)), 1, complete = true)))
    assert(Extract.enrichMeasurements(df, dim).filter($"city" === "Hanoi").count() == 2)
  }
}
