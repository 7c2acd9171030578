package graft.pipeline

/** Closed-form API fixture shared by the oracle-gated extraction entries
  * (q157: driver page loop + distributed fetch; q159: the DSv2
  * `format("openaq")` reader): locations 1..25 paginated 7 per page
  * (4 full pages + 1 partial, empty page 6 terminates), two sensors per
  * location (ids 2L and 2L+1), three hourly measurements per sensor with
  * value (sid*10 + m)/10.0, and a 404 for every sensor id divisible by
  * 13 (the continue-on-error skip). Every field is a closed-form
  * function of the ids, so the DuckDB oracle rebuilds the expected
  * output from `range()` — no captured data, no drift surface.
  * Control-flow semantics mirror reference `extract_api.py:38-104`
  * (pagination) and `:193-268` (per-sensor fetch).
  */
object FixtureApi {
  val pageSize = 7
  val locIds: Range = 1 to 25
  def sensorIdsOf(l: Int): Seq[Long] = Seq(2L * l, 2L * l + 1)
  val allSensorIds: Seq[Long] = locIds.flatMap(sensorIdsOf).sorted

  private def paramOf(sid: Long): String = if (sid % 2 == 0) "pm25" else "pm10"

  private def sensorJson(sid: Long): String = {
    val p = paramOf(sid)
    s"""{"id":$sid,"name":"sensor-$sid","parameter":{"id":${sid % 7},"name":"$p","units":"ug/m3","displayName":"$p"}}"""
  }

  private def locJson(l: Int): String =
    s"""{"id":$l,"name":"loc-$l","locality":"city-$l","timezone":"UTC",""" +
    s""""country":{"id":56,"code":"VN","name":"Vietnam"},""" +
    s""""coordinates":{"latitude":${l % 30}.5,"longitude":10${l % 10}.25},""" +
    s""""sensors":[${sensorJson(2L * l)},${sensorJson(2L * l + 1)}],""" +
    s""""datetimeFirst":{"utc":"2024-01-01T00:00:00Z","local":"2024-01-01T07:00:00+07:00"},""" +
    s""""datetimeLast":{"utc":"2024-01-31T00:00:00Z","local":"2024-01-31T07:00:00+07:00"}}"""

  private def measurementJson(sid: Long, m: Int): String = {
    val p = paramOf(sid)
    s"""{"value":$sid.$m,"parameter":{"id":${sid % 7},"name":"$p","units":"ug/m3","displayName":"$p"},""" +
    s""""period":{"label":"1h","interval":"01:00:00",""" +
    s""""datetimeFrom":{"utc":"2024-01-01T0$m:00:00Z","local":"2024-01-01T0$m:00:00+00:00"},""" +
    s""""datetimeTo":{"utc":"2024-01-01T0${m + 1}:00:00Z","local":"2024-01-01T0${m + 1}:00:00+00:00"}},""" +
    s""""flagInfo":{"hasFlags":false}}"""
  }

  def pages: Map[Int, ApiSource.FetchResult] =
    locIds.grouped(pageSize).zipWithIndex.map { case (ls, i) =>
      (i + 1) -> (ApiSource.Page(ls.map(locJson)): ApiSource.FetchResult)
    }.toMap

  def measurements: Map[Long, ApiSource.FetchResult] =
    allSensorIds.map { sid =>
      sid -> (if (sid % 13 == 0) ApiSource.HttpError(404, "gone")
              else ApiSource.Page((0 until 3).map(m => measurementJson(sid, m)))
             : ApiSource.FetchResult)
    }.toMap

  def fetcher: ApiSource.FixtureFetcher =
    ApiSource.FixtureFetcher(pages, measurements)

  /** The DuckDB oracle both q157 and q159 check against: the surviving
    * (sensor, hour) grid rebuilt from range(), skip-ids excluded.
    */
  val oracleSql: String = """
        WITH sensors AS (SELECT range AS sid FROM range(2, 52)),
        ms AS (SELECT range AS m FROM range(0, 3))
        SELECT sid AS sensor_id,
               '2024-01-01T0' || m || ':00:00Z' AS datetime,
               CASE WHEN sid % 2 = 0 THEN 'pm25' ELSE 'pm10' END AS parameter,
               (sid * 10 + m) / 10.0 AS value,
               'ug/m3' AS unit
        FROM sensors CROSS JOIN ms
        WHERE sid % 13 <> 0
        ORDER BY sensor_id, datetime"""
}

/** No-arg [[ApiSource.PageFetcher]] over [[FixtureApi]] — injectable by
  * class name into the DSv2 reader's `fetcher` option (executors
  * instantiate it reflectively; a no-arg class is the only shape that
  * survives that contract).
  */
final class FixtureApiFetcher extends ApiSource.PageFetcher {
  private val inner = FixtureApi.fetcher
  def fetchLocationsPage(countriesId: Int, limit: Int, page: Int): ApiSource.FetchResult =
    inner.fetchLocationsPage(countriesId, limit, page)
  def fetchMeasurements(sensorId: Long, dateFrom: String, dateTo: String,
      limit: Int): ApiSource.FetchResult =
    inner.fetchMeasurements(sensorId, dateFrom, dateTo, limit)
}
