package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's Athena SQL surface (SURVEY §3.3), re-hosted on
  * `spark.sql`: the exact query texts its docs/tests ship to Athena run
  * unchanged against the registered mart view — parse → analyze →
  * optimize → execute entirely inside Catalyst, returning typed rows
  * (an upgrade over Athena's all-string results the reference re-casts,
  * reference `utils/athena_utils.py:199`).
  */
object AnalyticsQueries {

  /** Named Athena-surface queries over a mart view (default `vietnam`). */
  def queries(view: String = "vietnam"): Map[String, String] = Map(
    // README.md:393-396
    "records_per_location" ->
      s"""SELECT location_id, location_name, city_name, COUNT(*) AS count
          FROM $view GROUP BY location_id, location_name, city_name
          ORDER BY count DESC""",
    // README.md:399
    "distinct_city" ->
      s"SELECT DISTINCT city_name FROM $view",
    // utils/athena_utils.py:192
    "row_count" ->
      s"SELECT COUNT(*) AS n FROM $view",
    // doc/architecture.md:374-386
    "top_pm25_by_location_day" ->
      s"""SELECT location_name, city_name, DATE(datetime) AS measurement_date,
                 AVG(pm25) AS avg_pm25, MAX(pm25) AS max_pm25
          FROM $view
          WHERE pm25 IS NOT NULL
          GROUP BY location_name, city_name, DATE(datetime)
          ORDER BY avg_pm25 DESC LIMIT 10""",
    // doc/archive/historical_backfill_2025_plan.md:352-358
    "partition_range_audit" ->
      s"""SELECT COUNT(*) AS record_count,
                 MIN(datetime) AS earliest, MAX(datetime) AS latest
          FROM $view""",
    // doc/archive/historical_backfill_2025_plan.md:372-380
    "pollutant_coverage" ->
      s"""SELECT SUM(CASE WHEN pm25 IS NOT NULL THEN 1 ELSE 0 END) AS pm25_count,
                 SUM(CASE WHEN pm10 IS NOT NULL THEN 1 ELSE 0 END) AS pm10_count,
                 SUM(CASE WHEN no2 IS NOT NULL THEN 1 ELSE 0 END) AS no2_count,
                 SUM(CASE WHEN so2 IS NOT NULL THEN 1 ELSE 0 END) AS so2_count,
                 SUM(CASE WHEN o3 IS NOT NULL THEN 1 ELSE 0 END) AS o3_count,
                 SUM(CASE WHEN co IS NOT NULL THEN 1 ELSE 0 END) AS co_count
          FROM $view""")

  def run(spark: SparkSession, name: String, view: String = "vietnam"): DataFrame =
    spark.sql(queries(view)(name))

  /** The pipeline's Athena-validation stage (reference
    * `pipelines/glue_pipeline.py:45-102`): list catalog tables, count rows
    * in each, succeed when at least one is non-empty. Pure catalog +
    * aggregate calls — no information_schema round-trips.
    */
  def validateTables(spark: SparkSession, tables: Seq[String]): Map[String, Long] =
    tables.map(t => t -> spark.table(t).count()).toMap
}
