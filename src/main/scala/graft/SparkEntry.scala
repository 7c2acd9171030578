package graft

import graft.queries.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual query definitions live in [[graft.queries.Catalog]]; this
  * object is the stable façade the driver invokes.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the five-table region-revenue rollup (scan → 2 shuffle joins → 3
    * broadcast joins → grouped agg).
    */
  def entry(spark: SparkSession): DataFrame =
    Catalog.all("q31_region_revenue").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map { case (name, q) => name -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every entry has one (round 5): hash-seeded
    * ops (LSH/IVF/HLL/GK) emit their recall/error GUARANTEES as
    * deterministic rows the oracle asserts, instead of rows-only checks.
    */
  def oracleSql: Map[String, String] =
    Catalog.all.collect { case (name, q) if q.oracle.isDefined =>
      name -> q.oracle.get.stripMargin.trim.replaceAll("\\s+", " ")
    }

  /** Headline benchmark subset (see Bench) — batch queries only. */
  def benchQueries: Seq[String] = Catalog.benchNames

  /** Streaming-harness bench subset, timed on its own line so micro-batch
    * latency never masks batch regressions (see Bench).
    */
  def benchStreamingQueries: Seq[String] = Catalog.benchStreamingNames
}
