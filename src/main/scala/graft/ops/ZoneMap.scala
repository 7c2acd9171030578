package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps — Delta/Iceberg-style data skipping rebuilt from
  * primitives: a per-file (min, max, rows) stats table over a sort/cluster
  * column, and a reader that opens ONLY the files whose range overlaps the
  * predicate.
  *
  * Parquet row-group statistics already prune WITHIN a file Spark decided
  * to read; a zone map prunes the file LISTING itself — at 100 TB with
  * z-ordered or range-partitioned layout (ops/ZOrder), a narrow predicate
  * plans a job over a handful of files instead of scheduling tasks for a
  * million of them. The stats build is one full scan (the indexing pass —
  * persist its output next to the table and refresh on append); each
  * pruned read then costs one bounded collect of the file list (one row
  * per FILE, the same driver footprint class as a filesystem listing,
  * which the scan planner performs anyway).
  *
  * The residual `BETWEEN` filter is always re-applied after pruning, so a
  * stale-but-superset stats table degrades to extra IO, never to wrong
  * results.
  */
object ZoneMap {

  /** Per-file stats over `c`: (file, min_v, max_v, n_rows). Partial
    * aggregation collapses each file's rows map-side, so the exchange
    * carries one row per (partition, file).
    */
  def fileStats(df: DataFrame, c: Column): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(c).as("min_v"), max(c).as("max_v"), count(lit(1)).as("n_rows"))

  /** Files whose [min_v, max_v] overlaps [lo, hi] — the read set for the
    * predicate `c BETWEEN lo AND hi`. Bounded collect: one string per
    * surviving file.
    */
  def overlappingFiles(stats: DataFrame, lo: Column, hi: Column): Seq[String] =
    stats
      .filter(col("min_v") <= hi && col("max_v") >= lo)
      .select("file")
      .collect()
      .map(_.getString(0))
      .toSeq

  /** Read only the files a `colName BETWEEN lo AND hi` predicate can touch,
    * with the exact filter re-applied (zone maps prune, the filter
    * decides). `stats` defaults to building fresh from `path`; pass a
    * persisted stats table to skip the indexing scan.
    */
  def prunedRead(
      spark: SparkSession,
      path: String,
      colName: String,
      lo: Column,
      hi: Column,
      stats: Option[DataFrame] = None): DataFrame = {
    val full = spark.read.parquet(path)
    val st = stats.getOrElse(fileStats(full, col(colName)))
    val files = overlappingFiles(st, lo, hi)
    val pruned =
      if (files.isEmpty) full.filter(lit(false)) // schema-stable empty
      else spark.read.schema(full.schema).parquet(files: _*)
    pruned.filter(col(colName).between(lo, hi))
  }
}
